from engine.core.grounding import (grounded_to_markdown, parse_det_boxes,
                                   parse_refs, scale_box, strip_eos)


def test_parse_refs_and_det():
    text = ("<|ref|>text<|/ref|><|det|>[[70, 203, 652, 319]]<|/det|>\nBody\n"
            "<|ref|>image<|/ref|><|det|>[[85, 103, 499, 305]]<|/det|>")
    refs = parse_refs(text)
    assert [r[1] for r in refs] == ["text", "image"]
    assert parse_det_boxes(refs[0][2]) == [[70, 203, 652, 319]]


def test_det_malformed_and_multibox():
    assert parse_det_boxes("[[12, 34, oops]]") is None
    assert parse_det_boxes("__import__('os')") is None
    assert parse_det_boxes("[[1,2,3,4],[5,6,7,8]]") == [[1, 2, 3, 4], [5, 6, 7, 8]]
    assert parse_det_boxes("[[1,2,3]]") is None  # not 4 coords


def test_scale_box_reference_rounding():
    assert scale_box([999, 999, 0, 500], 1000, 200) == [1000, 200, 0, 100]


def test_eos_strip_both_variants():
    assert strip_eos("a<｜end of sentence｜>b<｜end▁of▁sentence｜>c") == "abc"


def test_grounded_conversion_image_rewrite_and_page_convention():
    raw = ("<|ref|>title<|/ref|><|det|>[[1,2,3,4]]<|/det|>\n# T\n"
           "<|ref|>image<|/ref|><|det|>[[5,6,7,8]]<|/det|>\n"
           "\n<--- Page Split --->\n"
           "<|ref|>image<|/ref|><|det|>[[9,9,9,9]]<|/det|>")
    md, blocks, spans = grounded_to_markdown(raw)
    # page 0 image → images/0_0.jpg; page 1 image → images/1_0.jpg
    assert "![Figure 0-0](images/0_0.jpg)" in md
    assert "![Figure 1-0](images/1_0.jpg)" in md
    # trailing separators: page content PRECEDES its marker (Stage-A quirk)
    assert md.index("![Figure 0-0]") < md.index("--- Page 1 ---")
    assert md.rstrip().endswith("--- Page 2 ---")
    assert [b["label"] for b in blocks] == ["title", "image", "image"]
    # ref spans index the original payload
    for s in spans:
        assert raw[s.start:s.end].startswith("<|ref|>")


def test_coloneqq_rewrite():
    md, _, _ = grounded_to_markdown("x \\coloneqq y \\eqqcolon z")
    assert ":= y =:" in md


def test_det_fast_path_matches_literal_grammar():
    # grammar edges: missing comma between boxes and leading zeros are
    # SyntaxErrors in the literal parser and must stay rejected
    assert parse_det_boxes("[[1,2,3,4][5,6,7,8]]") is None
    assert parse_det_boxes("[[01,2,3,4]]") is None
    assert parse_det_boxes("[[1,2,3,4],]") == [[1, 2, 3, 4]]   # trailing comma ok
    assert parse_det_boxes("[[-0,2,3,4]]") == [[0, 2, 3, 4]]
    assert parse_det_boxes("[[+1,2,3,4]]") == [[1, 2, 3, 4]]   # via fallback
