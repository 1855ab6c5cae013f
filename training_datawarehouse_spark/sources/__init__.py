from .tables import TABLE_NAMES, load_table, load_tables  # noqa: F401
from .diary import diary_schema, read_diary  # noqa: F401
