"""Reusable column-expression builders (JVM-side, no UDFs)."""

from .layout import (  # noqa: F401
    add_zorder_key,
    interleave_bits,
    zorder_splits,
)
from .text import (  # noqa: F401
    duplicate_line_fraction,
    pii_hit_count,
    regex_token_count,
    repetition_ratio,
    scrub_pii,
    strip_repeated_lines,
)
from .vector import cosine_similarity, dot, l2_norm  # noqa: F401
