from engine.core.pages import count_page_markers, merge_pages, split_pages, word_count


def test_split_cover_and_numbered_pages():
    md = "cover text\n\n--- Page 1 ---\n\nfirst\n\n--- Page 2 ---\n\nsecond"
    pages = split_pages(md)
    assert [(p.page, p.content) for p in pages] == [
        (0, "cover text"), (1, "first"), (2, "second")]
    # offsets index the original string
    for p in pages:
        assert md[p.start:p.end] == p.content


def test_split_no_cover():
    md = "\n\n--- Page 1 ---\n\nonly page"
    assert [(p.page, p.content) for p in split_pages(md)] == [(1, "only page")]


def test_split_trailing_separator_yields_empty_page():
    # Stage-A output ends with a trailing separator (batch_pdf_processor.py:388-391)
    md = "p1 content\n\n--- Page 1 ---\n\n"
    assert [(p.page, p.content) for p in split_pages(md)] == [
        (0, "p1 content"), (1, "")]
    md2 = "a\n\n--- Page 1 ---\n\nb\n\n--- Page 2 ---\n\n"
    assert [(p.page, p.content) for p in split_pages(md2)] == [
        (0, "a"), (1, "b"), (2, "")]


def test_split_blank_cover_dropped():
    assert [(p.page, p.content) for p in split_pages("  \n\n--- Page 1 ---\n\nx")] == [(1, "x")]


def test_merge_pages_roundtrip_convention():
    assert merge_pages([(0, "c"), (1, "a"), (3, "b")]) == \
        "c\n\n--- Page 1 ---\n\na\n\n--- Page 3 ---\n\nb"
    assert merge_pages([(1, "a")]) == "\n\n--- Page 1 ---\n\na"


def test_counters():
    md = "x --- Page 1 --- y --- Page 12 --- z"
    assert count_page_markers(md) == 2
    assert word_count("hello, wörld 42") == 3
