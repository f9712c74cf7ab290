"""Shared tokenization contract.

Every text operator (dedup shingles, TF-IDF, LM scoring, PMI, vocab) and
every DuckDB oracle assumes the SAME tokenizer:
``string_split_regex(trim(lower(text)), '\\s+')``. Keeping it in one place
means a future tweak (e.g. unicode whitespace) cannot silently diverge
between operators that must agree on token identity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def low_toks(col: str = "text") -> Column:
    """Lowercased whitespace tokens of ``col`` — the corpus-wide contract."""
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")
