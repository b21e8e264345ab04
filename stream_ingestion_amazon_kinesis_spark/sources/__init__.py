from .catalog import load_table, load_tables, register_views  # noqa: F401
from .json_source import parse_json_records, SESSION_SCHEMA  # noqa: F401
