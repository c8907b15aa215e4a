from engine.core.figures import figure_context, filter_figures


def test_price_chart_heuristic_needs_all_three():
    md_all = ("![Rating chart](images/0_0.jpg)\n"
              "12-month price performance relative to the S&P since Jan 2024.")
    _, dropped, _ = filter_figures(md_all)
    assert dropped == ["0_0.jpg"]

    md_two = "![chart](images/0_1.jpg)\nprice performance relative to peers."
    kept, dropped, _ = filter_figures(md_two)  # no index, no time keyword
    assert dropped == [] and kept[0]["filename"] == "0_1.jpg"


def test_disclosure_context_drop_and_name_set_semantics():
    md = ("![a](images/1_0.jpg)\nSee the important disclosure section.\n"
          "\n\n--- Page 2 ---\n\n"
          "![b](images/1_0.jpg)\nperfectly innocent context here")
    kept, dropped, spans = filter_figures(md)
    # same filename on another page shares the drop verdict (set semantics)
    assert dropped == ["1_0.jpg"] and kept == []
    assert {s.kind for s in spans} == {"figure_dropped"}


def test_kept_figure_record_and_spans():
    md = "intro\n\n![Figure 1-0](images/1_0.jpg)\nneutral caption text"
    kept, dropped, spans = filter_figures(md)
    assert dropped == []
    assert kept[0]["page"] == 0 and kept[0]["path"] == "images/1_0.jpg"
    s = spans[0]
    assert md[s.start:s.end] == "![Figure 1-0](images/1_0.jpg)"


def test_figure_context_title_and_source():
    md = ("![Figure 0-0](images/0_0.jpg)\n"
          "<center>FIGURE 3. Dollar supply picked up </center>\n"
          "<center>Source: Haver Analytics</center>")
    ctx = figure_context(md, "0_0.jpg")
    assert ctx["title"] == "Dollar supply picked up"
    assert ctx["source"] == "Source: Haver Analytics"
    assert figure_context(md, "9_9.jpg") == {"title": None, "source": None}
