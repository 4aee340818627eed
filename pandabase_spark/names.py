"""Identifier hygiene (reference: pandabase/helpers.py:185-196 clean_name).

Pure-Python, no Spark dependency. Reference semantics preserved exactly:
lowercase + strip; a fixed set of punctuation characters become ``_``;
``.`` and ``,`` are deleted; a leading digit or any ``@`` raises NameError.
Behavior table: reference:tests/test_helpers.py:64-76.
"""

from __future__ import annotations

_TRANSLATE = str.maketrans(
    {c: "_" for c in ' ()+-/*";=&|#><^%{}'} | {".": None, ",": None}
)


def clean_name(name) -> str:
    """Normalize an identifier; raise NameError on irreparable names.

    Documented divergence from the reference: the leading-digit check
    here runs AFTER lower/strip, while the reference tests the RAW
    name first (reference:pandabase/helpers.py:185-196) — so a name
    like ``" 1abc"`` raises here but sneaks through cleaning in the
    reference (its raw first char is a space). The edge case is
    outside the reference's own test matrix
    (reference:tests/test_helpers.py:64-76); checking the cleaned
    form is the saner contract (what you check is what you store),
    and is pinned in tests/test_names.py.
    """
    name = str(name).lower().strip().translate(_TRANSLATE)
    if len(name) == 0:
        raise NameError("Column name cannot be empty after cleaning")
    if name[0].isdigit():
        raise NameError(f"Column name cannot begin with a digit: {name}")
    if "@" in name:
        raise NameError(f"Column name cannot contain '@': {name}")
    return name


def is_clean(name) -> bool:
    """True iff clean_name would leave the name unchanged (and not raise).

    The reference requires TABLE names to be pre-cleaned
    (reference:pandabase/sql.py:85-87) while column names are cleaned
    silently (reference:pandabase/sql.py:120).
    """
    try:
        return clean_name(name) == name
    except NameError:
        return False
