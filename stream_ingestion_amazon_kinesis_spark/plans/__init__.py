from .registry import QUERIES, QuerySpec, register, all_queries, all_oracles  # noqa: F401
