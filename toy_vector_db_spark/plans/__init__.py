from .dialect import SqlEngine, SqlResult  # noqa: F401
