from .tables import table, tables  # noqa: F401
from .csv_dir import scan_csv_dir, load_reference_trip_csvs  # noqa: F401
