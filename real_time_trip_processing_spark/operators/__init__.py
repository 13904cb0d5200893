from . import aggregates, cleaning, dedup, joins, sets, sorts  # noqa: F401
