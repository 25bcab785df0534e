"""Engine-wide constants.

Values mirror the reference's semantics knobs (cited per constant) so the
deterministic pipeline reproduces its behavior; everything else is a Spark
tuning knob with a scale rationale.
"""

# Max candidates per mention. Reference: /root/reference/src/refined/
# model_components/config.py:44 (max_candidates=30) and truncation at
# doc_preprocessing/candidate_generator.py:121.
MAX_CANDIDATES = 30

# Person-name coreference knobs. Reference: candidate_generator.py:58-60.
PERSON_COREF_PEM_CAP = 0.80
PERSON_COREF_PEM_MIN = 0.05

# NOTA sentinel qcode (reference pads candidate lists with ("Q0", 0.0),
# candidate_generator.py:66-68; we keep ragged lists and use Q0 only as the
# "no entity" sentinel).
NOTA_QCODE = "Q0"

# ED acceptance threshold (reference eval default, evaluation/evaluation.py:70-81).
ED_THRESHOLD = 0.15

# Mask value for candidates without a description embedding
# (reference ed_layer_2.py:87-104 masks to -100 before softmax).
NO_DESC_MASK = -100.0

# Mask value for pem==0 candidates in the final ED layer
# (reference entity_disambiguation_layer.py:94-109 uses -1e8).
PEM_ZERO_MASK = -1e8

# Embedding dim for the deterministic description/mention embeddings
# (reference uses 300-d fp16, doc_preprocessing/preprocessor.py:188-200;
# fixtures use a smaller dim — the math is identical).
EMB_DIM = 16

# MinHash-LSH blocking (north_rule addition, SURVEY.md §2.3 M6).
MINHASH_PERMS = 32
MINHASH_BANDS = 8          # 8 bands x 4 rows
SHINGLE_K = 3              # character shingle length for near-dup text keys
LSH_MAX_BUCKET = 1000      # doc-dedup band-bucket cap (mirrors blocking's
                           # max_block=1000); over-cap buckets are dropped
                           # with an eager logged count, never silently

# Pairwise score threshold for emitting mention-mention edges into the
# clustering graph (on top of mention->accepted-entity edges).
PAIR_SCORE_TAU = 0.5

# Shuffle sizing: tests/bench run on local[8..32]; at cluster scale this is
# overridden via spark-submit --conf. AQE coalesces small partitions anyway.
DEFAULT_SHUFFLE_PARTITIONS = 32

# Salting for skewed blocking keys: keys with more than this many mentions
# get salted into SKEW_SALT_BUCKETS sub-blocks before the candidate join.
SKEW_KEY_THRESHOLD = 10_000
SKEW_SALT_BUCKETS = 16
