"""Deterministic vocabularies for the synthetic Common-Crawl-style corpus.

Three disjoint token pools (disjointness is load-bearing: the dictionary
mention matcher must never fire on filler text):

- FILLER: connective words used for sentence bodies; never a surface form.
- NAME_STEMS: ambiguous entity name stems ("Jaguar"-style, cf. the
  reference's API example /root/reference/api/app/schemas/models.py:44-66).
- TOPICS: disambiguating context words; each maps to one fine-grained class
  (the deterministic stand-in for the reference's ~1.4k entity-typing
  classes, SURVEY.md §2.4 F4/F5).
"""

FILLER = (
    "report about during while where several often under quite rather "
    "through between toward against without within because although "
    "meanwhile moreover therefore however indeed nearly almost roughly "
    "around beyond across behind beneath beside despite except inside "
    "outside since until upon amid along among ahead apart aside away "
    "barely briefly broadly certainly clearly closely commonly daily "
    "deeply directly early easily equally exactly fairly finally firmly "
    "freely fully gently greatly hardly heavily highly instantly jointly "
    "keenly largely lately lightly likely locally loosely mainly mostly "
    "namely nearby neatly newly nicely notably openly partly plainly "
    "poorly promptly purely quickly quietly rapidly rarely readily "
    "really richly roundly sadly safely sharply shortly simply slightly "
    "slowly smoothly softly solely soon steadily strictly strongly "
    "surely swiftly tightly truly typically usually vastly warmly weekly "
    "widely wildly wholly r&d"
).split()

# Ambiguous name stems — each spawns 1-3 entities with different topics.
NAME_STEMS = (
    "Jaguar Phoenix Mercury Orion Vega Atlas Pallas Titan Aurora Lynx "
    "Falcon Raven Cobra Viper Puma Condor Osprey Kestrel Heron Ibis "
    "Delta Sierra Summit Cascade Granite Ember Quartz Onyx Zephyr Nimbus "
    "Vertex Apex Nova Pulsar Quasar Comet Meteor Eclipse Solstice Equinox "
    "Harbor Beacon Anchor Compass Sextant Astrolabe Ballast Keel Rudder Mast"
).split()

# topic word -> its class name (classes defined in CLASS_EDGES below).
TOPIC_CLASS = {
    "carmaker": "C_carmaker",
    "automobile": "C_carmaker",
    "felid": "C_felidae",
    "bird": "C_bird",
    "city": "C_city",
    "river": "C_river",
    "mountain": "C_mountain",
    "band": "C_band",
    "team": "C_team",
    "company": "C_company",
    "software": "C_software",
    "rocket": "C_rocket",
    "ship": "C_ship",
    "album": "C_album",
    "film": "C_film",
    "novel": "C_novel",
}

# Occupations double as person-disambiguation topics (one per person).
OCCUPATIONS = (
    "physicist chemist biologist geologist astronomer economist historian "
    "linguist violinist pianist sculptor architect surgeon cartographer "
    "botanist zoologist meteorologist archaeologist philosopher "
    "mathematician engineer journalist diplomat senator admiral"
).split()
for _occ in OCCUPATIONS:
    TOPIC_CLASS[_occ] = "C_person"

FIRST_NAMES = (
    "Alice Bruno Carla Dmitri Elena Farid Greta Hiro Ingrid Jonas Katya "
    "Liam Mara Nadia Otto Priya Quentin Rosa Stefan Tara Umar Vera Wendel "
    "Ximena Yusuf Zara"
).split()

# First block: shared surnames (coref ambiguity); second block: unique.
LAST_NAMES_SHARED = (
    "Johnson Almeida Kowalski Petrov Tanaka Okafor Lindqvist Moreau "
    "Castellano Virtanen"
).split()
LAST_NAMES_UNIQUE = (
    "Abernathy Balthazar Crowhurst Dunmore Eastgate Fairweather Galloway "
    "Hawthorne Iverson Jellicoe Kingsley Lockwood Montrose Northcote "
    "Oakhurst Pemberton Quillfeather Ravensworth Stanhope Thornbury "
    "Underhill Vandermeer Wexford Yarborough Ashdown Birchwood Coldstream "
    "Dovetail Elmsworth Foxglove"
).split()

# Surfaces guaranteed NOT in the alias table -> NIL mentions.
NIL_SURFACES = (
    "Zzyzx Qwertic Xylograph Vantablack Snigglet Blorptech Quuxcorp "
    "Zamboni Frobnitz Glyphware"
).split()

# Small subclass DAG (child, parent) — includes a diamond via C_team.
CLASS_EDGES = [
    ("C_org", "C_thing"),
    ("C_company", "C_org"),
    ("C_carmaker", "C_company"),
    ("C_software", "C_company"),
    ("C_band", "C_org"),
    ("C_sports_org", "C_org"),
    ("C_team", "C_sports_org"),
    ("C_team", "C_company"),  # diamond: team -> {sports_org, company} -> org
    ("C_animal", "C_thing"),
    ("C_felidae", "C_animal"),
    ("C_bird", "C_animal"),
    ("C_place", "C_thing"),
    ("C_city", "C_place"),
    ("C_river", "C_place"),
    ("C_mountain", "C_place"),
    ("C_person", "C_thing"),
    ("C_vehicle", "C_thing"),
    ("C_rocket", "C_vehicle"),
    ("C_ship", "C_vehicle"),
    ("C_work", "C_thing"),
    ("C_album", "C_work"),
    ("C_film", "C_work"),
    ("C_novel", "C_work"),
]

# Diacritic variants used when planting raw surfaces (ascii_fold-parity set).
DIACRITIC_MAP = {
    "a": "á", "e": "é", "i": "í", "o": "ó", "u": "ú", "n": "ñ", "c": "ç",
}
