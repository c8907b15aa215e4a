"""_locate retry-budget behavior (span search must not go quadratic on a
pathological turn with thousands of repeated, relocated passages)."""

from engine.core.extract import _locate


def test_locate_basic():
    s = "abc xyz abc"
    assert _locate(s, "xyz") == (4, 7)
    assert _locate(s, "abc", 1) == (8, 11)   # anchored finds the next copy
    assert _locate(s, "missing") == (-1, -1)
    assert _locate(s, "") == (-1, -1)


def test_locate_unanchored_retry_consumes_budget():
    s = "abc xyz abc"
    budget = [1]
    # anchored miss past the last copy → one budgeted rescan from 0
    assert _locate(s, "abc", 9, budget) == (0, 3)
    assert budget[0] == 0
    # budget exhausted → degrade to (-1,-1), never a wrong offset
    assert _locate(s, "abc", 9, budget) == (-1, -1)


def test_locate_from_zero_never_double_scans():
    """from_=0 IS the unanchored scan; a miss must not burn budget."""
    budget = [5]
    assert _locate("abc", "zzz", 0, budget) == (-1, -1)
    assert budget[0] == 5
