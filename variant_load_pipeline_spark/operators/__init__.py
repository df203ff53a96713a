from . import dedup, interval_join, similarity, upsert, windows  # noqa: F401
