from .protect import protect_column, protect_columns, unprotect_column, unprotect_columns

__all__ = [
    "protect_column",
    "protect_columns",
    "unprotect_column",
    "unprotect_columns",
]
