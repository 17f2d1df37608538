from .fetch import fetch_urls  # noqa: F401
from .tables import TABLES, load_table, load_tables  # noqa: F401
