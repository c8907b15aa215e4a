import hashlib

from engine.core.numerics import (coerce_to_number, context_window,
                                  extract_numerics, infer_metric_type,
                                  infer_unit)


def test_percentage_extraction_value_and_id():
    text = "Revenue grew 6.2% in the quarter."
    [n] = extract_numerics(text, 1)
    assert n["value"] == 0.062
    assert n["unit"] == "percentage"
    ctx = context_window(text, text.index("6.2%"), text.index("6.2%") + 4)
    # id hashes the STRING group for percentages
    assert n["num_id"] == hashlib.md5(f"1_6.2_{ctx[:30]}".encode()).hexdigest()[:16]


def test_currency_scaling_and_id_uses_float():
    text = "Capex of $1,234.5M was guided."
    [n] = extract_numerics(text, 2)
    assert n["value"] == 1234.5e6
    assert n["unit"] == "$"
    assert f"2_{1234.5e6}_" in f"2_{n['value']}_"  # float repr goes into the hash
    ctx = n["context"]
    assert n["num_id"] == hashlib.md5(f"2_{1234.5e6}_{ctx[:30]}".encode()).hexdigest()[:16]


def test_order_percentages_before_currencies_and_cap():
    text = " ".join(f"{i}% and ${i}K" for i in range(40))
    nums = extract_numerics(text, 0)
    assert len(nums) == 50  # 40 pct + first 10 currencies
    assert all(n["unit"] == "percentage" for n in nums[:40])
    assert all(n["unit"] == "$" for n in nums[40:])


def test_context_window_collapse():
    text = "a" * 300 + "  multi\nline   5% tail  " + "b" * 300
    [n] = extract_numerics(text, 0)
    assert "\n" not in n["context"] and "  " not in n["context"]
    assert len(n["context"]) <= 200


def test_coerce_to_number():
    assert coerce_to_number(3, None) == (3.0, "3", False)
    assert coerce_to_number("(1,200)", None) == (-1200.0, "(1,200)", False)
    assert coerce_to_number("12.5%", None) == (0.125, "12.5%", True)
    assert coerce_to_number("0.9%", None) == (0.9, "0.9%", True)  # ≤1.5 not rescaled
    assert coerce_to_number("n/a", None)[0] is None
    assert coerce_to_number(None, None) == (None, None, False)
    assert coerce_to_number("1-2-3", None)[0] == -123.0  # multi-dash fold


def test_infer_unit_and_metric_type():
    assert infer_unit(None, True) == "%"
    assert infer_unit("$5", False) == "USD"
    assert infer_unit("about €9", False) == "EUR"
    assert infer_unit("plain", False) == "unitless"
    assert infer_metric_type(None, None, "growth of sales", None, False) == "percentage"
    assert infer_metric_type(None, None, "12 per share", None, False) == "per_share"
    assert infer_metric_type("ratio", None, "", None, False) == "ratio"
    assert infer_metric_type(None, None, "nothing special", None, False) == "other"


def test_numeric_prescan_matches_direct_finditer():
    """The hint-windowed %/symbol prescan must yield byte-identical match
    sequences to the direct finditer it replaced (N1/N2 parity contract —
    same trick, same differential guarantee, as the companies scan)."""
    import random

    from engine.core import numerics

    def spans(it):
        return [(m.start(), m.end(), m.groups()) for m in it]

    rng = random.Random(11)
    toks = ["5", "12.5", "1.2.3", "..5", "+", "-", "+-", "%", " %", "%%",
            "$", "€", "£", "¥", "$ ", "B", "M", "K", "1,200", "1,20",
            ",", ".", " ", "\n", "\t", " ", "x", "abc", "٣٤",
            "5%", "$5.2B", "-3.1 %", "（", "5 5%", "$%", "%5", ""]
    for _ in range(6000):
        t = "".join(rng.choice(toks) for _ in range(rng.randint(0, 24)))
        assert spans(numerics._pct_iter(t)) == \
            spans(numerics._PCT_RE.finditer(t)), repr(t)
        assert spans(numerics._ccy_iter(t)) == \
            spans(numerics._CCY_RE.finditer(t)), repr(t)
