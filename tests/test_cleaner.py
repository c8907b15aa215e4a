from engine.core.cleaner import clean_markdown


def test_section_removal_until_next_header():
    md = ("## Keep Me\n\nbody kept\n\n## Important Disclosures\n\ndropped body\n"
          "more dropped\n\n## Outlook\n\nalso kept")
    cleaned, stats, _ = clean_markdown(md)
    assert "dropped" not in cleaned
    assert "body kept" in cleaned and "also kept" in cleaned
    assert stats["removed_sections"] == 1
    assert stats["removed_section_names"] == ["important_disclosures"]


def test_indented_header_not_matched():
    # '^#' anchors are searched against the raw line, so a mid-content
    # indented header does NOT start a removed section (page-level strip only
    # trims the page edges; the paragraph pass later strips the indent)
    md = "intro line\n\n  ## Important Disclosures\n\nsurvives because header is indented"
    cleaned, stats, _ = clean_markdown(md)
    assert stats["removed_sections"] == 0
    assert "survives" in cleaned
    assert cleaned == "intro line\n\n## Important Disclosures\n\nsurvives because header is indented"


def test_paragraph_rules():
    md = ("Real content paragraph long enough.\n\n"
          "Bloomberg® is a trademark and service mark of Bloomberg Finance L.P.\n\n"
          "© Copyright 2024 Anybody.\n\n"
          "Contact us Email: someone@example.com for details.\n\n"
          "Final keeper paragraph.")
    cleaned, stats, _ = clean_markdown(md)
    assert stats["removed_paragraphs"] == 3
    assert cleaned == "Real content paragraph long enough.\n\nFinal keeper paragraph."


def test_empty_pages_dropped_and_merge_convention():
    md = ("## Disclaimer\n\nonly boilerplate here\n\n"
          "--- Page 1 ---\n\nreal body text\n\n--- Page 2 ---\n\n## Americas\n\nlegal")
    cleaned, _, _ = clean_markdown(md)
    # page 0 and page 2 vanish entirely; page 1 survives with its separator
    assert cleaned == "\n\n--- Page 1 ---\n\nreal body text"


def test_stats_and_reduction_ratio():
    cleaned, stats, _ = clean_markdown("")
    assert cleaned == ""
    assert stats["reduction_ratio"] == 0
    md = "keep this line of content"
    cleaned, stats, _ = clean_markdown(md)
    assert stats["original_length"] == len(md)
    assert stats["final_length"] == len(cleaned)


def test_spans_point_into_original():
    md = ("intro paragraph kept\n\n## Analyst Certification\n\nzapped\n\n"
          "--- Page 1 ---\n\n© Copyright 2025 X.\n\nkept tail")
    _, _, spans = clean_markdown(md)
    by_kind = {}
    for s in spans:
        by_kind.setdefault(s.kind, []).append(s)
    sec = by_kind["removed_section"][0]
    assert md[sec.start:sec.end] == "## Analyst Certification"
    para = by_kind["removed_paragraph"][0]
    assert md[para.start:para.end] == "© Copyright 2025 X."
    for s in spans:
        assert s.start == -1 or (0 <= s.start <= s.end <= len(md))


def test_every_section_rule_triggers():
    cases = {
        "analyst_certification": "## Analyst Certification",
        "important_disclosures": "# Important Disclosures",
        "risk_disclosure": "## Risk Disclosures",
        "availability_disclosures": "## Availability of Disclosures",
        "information_sources": "## Disclosures regarding Information Sources",
        "rating_system": "## Guide to the Stock Rating System",
        "price_target": "## Guide to the Firm Price Target",
        "distribution_ratings": "## Distribution of Ratings",
        "disclosure_legend": "## Disclosure Legend",
        "legal_entities": "## Legal Entities Involved in Producing the report",
        "regional_legal_uk": "## United Kingdom / EEA",
        "regional_legal_americas": "## Americas",
        "regional_legal_japan": "## Japan",
        "regional_legal_hongkong": "## Hong Kong",
        "regional_legal_middleeast": "## Middle East",
        "regional_legal_australia": "## Australia",
        "regional_legal_singapore": "## Singapore",
        "conference_schedule": "## Conference Schedule",
        "disclaimer": "## Disclaimers",
    }
    for name, header in cases.items():
        md = f"keep this intro line\n\n{header}\n\ndropped body text"
        cleaned, stats, _ = clean_markdown(md)
        assert stats["removed_section_names"] == [name], (name, stats)
        assert "dropped body" not in cleaned, name


def test_every_paragraph_rule_triggers():
    cases = {
        "trademark_bloomberg": "Bloomberg® is a trademark of someone.",
        "copyright_barclays": "Barclays Bank PLC retains all rights.",
        "copyright_generic": "© Copyright 2031 Example Corp.",
        "analyst_contact": "Reach us at Tel: +44 20 7777 0000 today.",
    }
    for name, para in cases.items():
        md = f"kept paragraph stays here\n\n{para}"
        cleaned, stats, spans = clean_markdown(md)
        assert stats["removed_paragraphs"] == 1, name
        labels = [s.label for s in spans if s.kind == "removed_paragraph"]
        assert labels == [name], (name, labels)
