from .portable import (  # noqa: F401
    h64,
    h64_sql,
    shingles,
    shingles_sql,
    words,
    words_sql,
    norm_text,
    norm_text_sql,
)
