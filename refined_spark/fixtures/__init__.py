from .gen import ensure_fixtures, fixture_dir_for_sf, TIER_FOR_SF  # noqa: F401
