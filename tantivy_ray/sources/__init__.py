from .writer import IndexWriter  # noqa: F401
from .readers import pages_from_csv, pages_from_json, pages_from_parquet  # noqa: F401
