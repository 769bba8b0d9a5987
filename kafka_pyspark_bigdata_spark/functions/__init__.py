from .numeric import dsum, davg, dsum_expr, davg_sql, dsum_sql  # noqa: F401
