"""DuckDB oracle SQL for every hash-checkable query in __spark_entry__.

The driver registers views (region nation customer supplier part orders
lineitem events documents embeddings) over the same parquet the Spark
queries read; extraction oracles read the committed expected_*.parquet files
(pure-Python kernel output, see tools/build_expected.py).

Every aggregate is cast so the DuckDB result schema mirrors the Spark one
(DuckDB SUM(INT)→HUGEINT etc. would otherwise drift), and every hash is md5
so values are engine-independent.
"""

from __future__ import annotations

from engine.datawork.textstats import (BPE_TOKEN_RE, CJK_RE, PUNCT_RE,
                                       STOPWORDS)


def _stoplist(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


_WORDS = "string_split_regex(trim(lower(text)), '\\s+')"

def _shingles_from(src: str) -> str:
    """The shingles CTE over an arbitrary source relation (default callers
    use the documents view; the composed curate oracle feeds a filtered
    CTE instead)."""
    return f"""
shingles AS (
    SELECT DISTINCT doc_id AS id, sh
    FROM (SELECT doc_id, {_WORDS} AS ws FROM {src}) w,
         UNNEST(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                               i -> array_to_string(ws[i:i+2], ' '))) AS t(sh)
)"""


_SHINGLES = _shingles_from("documents")


def _minhash_sig_sql(src: str = "documents", lead: str = "WITH ") -> str:
    from engine.datawork.dedup import MINHASH_K, MINHASH_PRIME
    mins = ",\n        ".join(
        f"min((ha + {i} * hb) % {MINHASH_PRIME}) AS mh{i}"
        for i in range(MINHASH_K))
    return f"""
{lead}{_shingles_from(src)},
hashed AS (
    SELECT id,
           CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) AS ha,
           2 * CAST(('0x' || substr(md5(sh), 9, 8)) AS BIGINT) + 1 AS hb
    FROM shingles
),
sig AS (
    SELECT id, {mins}
    FROM hashed GROUP BY id
)"""


def _simhash_core() -> str:
    votes = ",\n        ".join(
        f"CAST(sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v{b}"
        for b in range(32))
    bits = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(32))
    return f"""
WITH tok AS (
    SELECT doc_id AS id,
           CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h
    FROM (SELECT doc_id, {_WORDS} AS ws FROM documents) w,
         UNNEST(ws) AS t(token)
),
votes AS (
    SELECT id, {votes}
    FROM tok GROUP BY id
),
sh AS (
    SELECT id, CAST({bits} AS BIGINT) AS simhash FROM votes
)"""


def _dot_sql(a: str, b: str) -> str:
    return (f"list_sum(list_transform(range(1, 65), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")


def _norm_sql(a: str) -> str:
    return f"sqrt({_dot_sql(a, a)})"


def _plane_bucket_sql(col: str, n_planes: int | None = None) -> str:
    from engine.datawork.similarity import lsh_planes
    cases = []
    planes = lsh_planes(n_planes) if n_planes else lsh_planes()
    for p in planes:
        arr = "[" + ", ".join(repr(v) for v in p) + "]"
        dot = (f"list_sum(list_transform(range(1, 65), "
               f"i -> CAST({col}[i] AS DOUBLE) * ({arr})[i]))")
        cases.append(f"CASE WHEN {dot} > 0 THEN '1' ELSE '0' END")
    return " || ".join(cases)


def build_oracles(exp_dir: str) -> dict[str, str]:
    def exp(name: str) -> str:
        return f"read_parquet('{exp_dir}/{name}.parquet')"

    o: dict[str, str] = {}

    # ---- extraction family: compare against the pure-Python oracle dumps ----
    o["extract_per_turn"] = f"""
SELECT conv_id, turn_idx, payload_kind, cleaned_md5, cleaned_len, word_count,
       page_count, removed_sections, removed_paragraphs, passages_count,
       tables_count, numerics_count, entities_count, figures_kept_count,
       figures_dropped_count, n_spans, title, date, language, error
FROM {exp('expected_turns')}"""

    o["extract_kind_rollup"] = f"""
SELECT payload_kind,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(cleaned_len) AS BIGINT) AS cleaned_chars,
       CAST(sum(word_count) AS BIGINT) AS words,
       CAST(sum(removed_sections) AS BIGINT) AS removed_sections,
       CAST(sum(removed_paragraphs) AS BIGINT) AS removed_paragraphs,
       CAST(sum(passages_count) AS BIGINT) AS passages,
       CAST(sum(tables_count) AS BIGINT) AS tables,
       CAST(sum(numerics_count) AS BIGINT) AS numerics,
       CAST(sum(CASE WHEN error IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS errors
FROM {exp('expected_turns')} GROUP BY payload_kind"""

    o["extract_passages"] = f"""
SELECT conv_id, turn_idx, passage_id, page, text_len, text_md5
FROM {exp('expected_passages')}"""

    o["extract_numerics"] = f"""
SELECT conv_id, turn_idx, num_id, value, unit, metric_type, page
FROM {exp('expected_numerics')}"""

    o["extract_tables"] = f"""
SELECT conv_id, turn_idx, table_id, page, n_cols, n_rows, title
FROM {exp('expected_tables')}"""

    o["extract_spans"] = f"""
SELECT conv_id, turn_idx, kind, start, "end", label
FROM {exp('expected_spans')}"""

    o["conversation_rollup"] = f"""
SELECT conv_id, n_turns, max_turn_idx, conv_text_md5, tickers_csv,
       passages_count, tables_count, numerics_count, failed_turns,
       cleaned_chars
FROM {exp('expected_convs')}"""

    o["conversation_documents"] = f"""
SELECT conv_id, n_turns, doc_md5, is_valid
FROM {exp('expected_docs')}"""

    # the salted two-pass path must be byte-identical to the single-pass
    # path, so it shares the same expected table — the driver gate itself
    # is the equivalence proof
    o["conversation_documents_salted"] = o["conversation_documents"]

    # ---- relational family over the registered views ----
    o["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2002-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""

    o["top_customers"] = """
WITH rev AS (
    SELECT o_custkey, round(sum(o_totalprice), 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
)
SELECT CAST(row_number() OVER (ORDER BY revenue DESC, o_custkey) AS INTEGER) AS rank,
       o_custkey AS custkey, c_name, revenue, n_orders
FROM rev JOIN customer ON o_custkey = c_custkey
ORDER BY rank LIMIT 25"""

    o["events_daily"] = """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS value_sum
FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

    o["shipping_priority"] = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10"""

    o["regional_volume"] = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name ORDER BY revenue DESC"""

    o["events_grouping_sets"] = """
SELECT event_type, CAST(ts AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS value_sum
FROM events
GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)),
                        (event_type), (CAST(ts AS DATE)), ())"""

    o["asof_latest_click"] = """
SELECT l.event_id, l.user_id,
       r.event_id AS click_event_id, r.value AS click_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN
     (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts"""

    o["top_suppliers_per_nation"] = """
SELECT n_name, rk, s_suppkey, s_name, acctbal FROM (
    SELECT n_name, s_suppkey, s_name, round(s_acctbal, 2) AS acctbal,
           row_number() OVER (PARTITION BY n_name
                              ORDER BY s_acctbal DESC, s_suppkey) AS rk
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
) WHERE rk <= 3 ORDER BY n_name, rk"""

    o["customers_without_orders"] = """
SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(c_acctbal), 2) AS acctbal_sum
FROM customer c JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY n_name ORDER BY n_name"""

    # the salted two-stage aggregation must be INVISIBLE in the result —
    # same oracle text as events_daily
    o["events_salted_daily"] = """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS value_sum
FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

    o["events_retention"] = """
WITH d AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort_day
    FROM events
)
SELECT cohort_day, datediff('day', cohort_day, day) AS day_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users
FROM d
WHERE datediff('day', cohort_day, day) IN (0, 1, 7, 30)
GROUP BY 1, 2 ORDER BY 1, 2"""

    o["events_sessionize"] = """
WITH flags AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR CAST(floor(epoch(ts)) AS BIGINT)
                        - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 300
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id, value,
           CAST(sum(new_session) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flags
)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS value_sum
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_id"""

    o["events_stream_window"] = """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS value_sum
FROM events GROUP BY 1, 2"""

    # the stateful-streaming sessionizer must reproduce the batch answer
    o["events_stream_sessionize"] = o["events_sessionize"]

    # streaming dedup of a replayed tail must equal exactly-once over the
    # original events (event_id is the delivery key)
    o["events_stream_dedup"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS value_sum
FROM events GROUP BY event_type ORDER BY event_type"""

    o["events_props_json"] = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL"""

    o["transcript_tokens_bpe"] = f"""
SELECT conv_id, turn_idx, n_tokens, tokens_md5
FROM {exp('expected_bpe')}"""

    # ---- SFT example assembly (engine/datawork/sft.py) ----
    # Rendering contract: '<|role|>\n<text>' units joined by '\n\n';
    # NULL role/text blank. Window frames mirror the Spark spellings.
    _sft_t = f"""
t AS (
    SELECT conv_id, turn_idx, coalesce(role, '') AS role,
           coalesce(text, '') AS tgt,
           '<|' || coalesce(role, '') || '|>' || chr(10)
                || coalesce(text, '') AS u
    FROM read_parquet('{exp_dir}/transcripts.parquet')
)"""
    _sft_emit = """
SELECT conv_id, turn_idx, n_ctx,
       CAST(length(ctx) AS BIGINT) AS ctx_chars,
       md5(ctx) AS ctx_md5,
       CAST(length(tgt) AS BIGINT) AS target_chars,
       md5(tgt) AS target_md5
FROM w WHERE role = 'assistant' AND n_ctx >= 1"""

    o["sft_pairs"] = f"""
WITH {_sft_t},
w AS (
    SELECT conv_id, turn_idx, role, tgt,
           string_agg(u, chr(10) || chr(10)) OVER win AS ctx,
           CAST(count(u) OVER win AS INT) AS n_ctx
    FROM t
    WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
)
{_sft_emit}"""

    o["sft_pairs_budget"] = f"""
WITH {_sft_t},
cs AS (
    SELECT *, coalesce(sum(CAST(length(u) + 2 AS BIGINT)) OVER
                  (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cstart
    FROM t
),
w AS (
    SELECT conv_id, turn_idx, role, tgt,
           string_agg(u, chr(10) || chr(10)) OVER win AS ctx,
           CAST(count(u) OVER win AS INT) AS n_ctx
    FROM cs
    WINDOW win AS (PARTITION BY conv_id ORDER BY cstart
                   RANGE BETWEEN 4000 PRECEDING AND 1 PRECEDING)
)
{_sft_emit}"""

    # token-budget SFT context: identical RANGE-frame algebra with the
    # per-turn cost in REAL BPE tokens (+4 overhead/turn) — counts come
    # from the committed expected_bpe table (the Spark-free kernel's
    # output); ctx_tokens puts the admitted budget itself under the gate
    o["sft_pairs_budget_tokens"] = f"""
WITH t AS (
    SELECT s.conv_id, s.turn_idx, coalesce(s.role, '') AS role,
           coalesce(s.text, '') AS tgt,
           '<|' || coalesce(s.role, '') || '|>' || chr(10)
                || coalesce(s.text, '') AS u,
           CAST(b.n_tokens + 4 AS BIGINT) AS cost
    FROM read_parquet('{exp_dir}/transcripts.parquet') s
    JOIN {exp('expected_bpe')} b USING (conv_id, turn_idx)
),
cs AS (
    SELECT *, coalesce(sum(cost) OVER
                  (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cstart
    FROM t
),
w AS (
    SELECT conv_id, turn_idx, role, tgt,
           string_agg(u, chr(10) || chr(10)) OVER win AS ctx,
           CAST(count(u) OVER win AS INT) AS n_ctx,
           CAST(coalesce(sum(cost) OVER win, 0) AS BIGINT) AS ctx_tokens
    FROM cs
    WINDOW win AS (PARTITION BY conv_id ORDER BY cstart
                   RANGE BETWEEN 600 PRECEDING AND 1 PRECEDING)
)
SELECT conv_id, turn_idx, n_ctx, ctx_tokens,
       CAST(length(ctx) AS BIGINT) AS ctx_chars,
       md5(ctx) AS ctx_md5,
       CAST(length(tgt) AS BIGINT) AS target_chars,
       md5(tgt) AS target_md5
FROM w WHERE role = 'assistant' AND n_ctx >= 1"""

    # DPO pairs: the sft_pairs chain + cyclic next-in-md5-order negative
    # inside a 16-way md5 bucket; degenerate (chosen==rejected) dropped
    o["preference_pairs"] = f"""
WITH {_sft_t},
w AS (
    SELECT conv_id, turn_idx, role, tgt,
           string_agg(u, chr(10) || chr(10)) OVER win AS ctx,
           CAST(count(u) OVER win AS INT) AS n_ctx
    FROM t
    WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
),
ex AS (
    SELECT conv_id, turn_idx, n_ctx,
           CAST(length(ctx) AS BIGINT) AS ctx_chars, md5(ctx) AS ctx_md5,
           CAST(length(tgt) AS BIGINT) AS chosen_chars,
           md5(tgt) AS chosen_md5,
           md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)) AS hk,
           CAST(('0x' || substr(md5(conv_id || ':'
                || CAST(turn_idx AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS b
    FROM w WHERE role = 'assistant' AND n_ctx >= 1
),
p AS (
    SELECT *,
           coalesce(lead(conv_id) OVER win, first_value(conv_id) OVER winf)
               AS rej_conv_id,
           coalesce(lead(turn_idx) OVER win, first_value(turn_idx) OVER winf)
               AS rej_turn_idx,
           coalesce(lead(chosen_chars) OVER win,
                    first_value(chosen_chars) OVER winf) AS rejected_chars,
           coalesce(lead(chosen_md5) OVER win,
                    first_value(chosen_md5) OVER winf) AS rejected_md5
    FROM ex
    WINDOW win AS (PARTITION BY b ORDER BY hk, conv_id, turn_idx),
           winf AS (PARTITION BY b ORDER BY hk, conv_id, turn_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING)
)
SELECT conv_id, turn_idx, n_ctx, ctx_chars, ctx_md5, chosen_chars,
       chosen_md5, rej_conv_id, rej_turn_idx, rejected_chars, rejected_md5
FROM p WHERE rejected_md5 <> chosen_md5
ORDER BY conv_id, turn_idx"""

    o["sql_function_surface"] = f"""
SELECT conv_id, turn_idx, cleaned_md5
FROM {exp('expected_turns')} WHERE payload_kind = 'md_clean'"""

    # ---- text stats ----
    stops_en = _stoplist("en")
    o["doc_text_stats"] = f"""
WITH base AS (
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars,
           CASE WHEN trim(text) = '' THEN 0
                ELSE CAST(len({_WORDS}) AS INTEGER) END AS n_ws,
           CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS INTEGER) AS n_bpe,
           CAST(len(regexp_extract_all(text, '{PUNCT_RE}')) AS INTEGER) AS n_punct,
           CAST(len(list_filter({_WORDS},
                w -> list_contains({stops_en}, w))) AS INTEGER) AS n_stop
    FROM documents
), ratios AS (
    SELECT *,
           CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_r,
           CASE WHEN n_ws > 0 THEN n_stop / n_ws ELSE 0.0 END AS stop_r,
           CASE WHEN n_ws > 0 THEN n_chars / n_ws ELSE 0.0 END AS mwl
    FROM base
)
SELECT doc_id, n_chars AS n_chars_calc, n_ws AS tokens_ws, n_bpe AS tokens_bpe,
       CAST(round(punct_r, 6) AS DOUBLE) AS punct_ratio,
       CAST(round(stop_r, 6) AS DOUBLE) AS stopword_ratio,
       CAST(round(
            (CASE WHEN n_chars >= 100 THEN 0.4 ELSE n_chars / 250.0 END)
            + least(stop_r * 2.0, 0.4)
            + (CASE WHEN punct_r < 0.1 AND mwl >= 3 AND mwl <= 12
                    THEN 0.2 ELSE 0.0 END), 6) AS DOUBLE) AS quality_score
FROM ratios"""

    hits = ",\n           ".join(
        f"CAST(len(list_filter({_WORDS}, w -> list_contains({_stoplist(lang)}, w))) AS INTEGER) AS {lang}"
        for lang in STOPWORDS)
    chain = "\n            ".join(
        f"WHEN {lang} = greatest(de, en, es, fr) THEN '{lang}'"
        for lang in sorted(STOPWORDS))
    o["doc_lang_id"] = f"""
WITH hits AS (
    SELECT doc_id, lang,
           CAST(len(regexp_extract_all(text, '{CJK_RE}')) AS INTEGER) AS cjk,
           {hits}
    FROM documents
)
SELECT doc_id, lang,
       CASE WHEN cjk > 0 THEN 'zh'
            {chain}
       END AS lang_pred
FROM hits"""

    o["doc_repetition"] = f"""
WITH g AS (
    SELECT doc_id,
           CASE WHEN len({_WORDS}) >= 3
                THEN list_transform(range(1, len({_WORDS}) - 1),
                                    i -> array_to_string(({_WORDS})[i:i+2], ' '))
                ELSE [] END AS grams
    FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN len(grams) > 0
                 THEN round(len(list_distinct(grams)) / len(grams), 6)
                 ELSE 1.0 END AS DOUBLE) AS repetition_ratio
FROM g"""

    from engine.datawork.textstats import (BULLET_LINE_RE, ELLIPSIS_END_RE,
                                           SYMBOL_RE)
    _qflags_sql = f"""
WITH base AS (
    SELECT doc_id,
           {_WORDS} AS ws,
           string_split(text, chr(10)) AS lines,
           CASE WHEN trim(text) = '' THEN 0 ELSE len({_WORDS}) END AS nw,
           coalesce(list_sum(list_transform({_WORDS}, x -> length(x))), 0) AS sl,
           len(regexp_extract_all(text, '{SYMBOL_RE}')) AS nsym
    FROM documents
), feat AS (
    SELECT doc_id, nw,
           CASE WHEN nw > 0 THEN sl / nw ELSE 0.0 END AS mwl,
           CASE WHEN nw > 0 THEN nsym / nw ELSE 0.0 END AS symr,
           len(lines) AS nl,
           len(list_filter(lines, l -> regexp_matches(l, '{BULLET_LINE_RE}'))) AS nbul,
           len(list_filter(lines, l -> regexp_matches(l, '{ELLIPSIS_END_RE}'))) AS nell,
           list_filter(list_transform(lines, l -> trim(l)), l -> l != '') AS nb,
           len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS nalpha,
           len(list_intersect(list_distinct(ws), {stops_en})) AS nstop
    FROM base
), r AS (
    SELECT doc_id, nw, mwl, symr, nstop,
           CASE WHEN nl > 0 THEN nbul / nl ELSE 0.0 END AS bulf,
           CASE WHEN nl > 0 THEN nell / nl ELSE 0.0 END AS ellf,
           CASE WHEN len(nb) > 0
                THEN (len(nb) - len(list_distinct(nb))) / len(nb)
                ELSE 0.0 END AS repf,
           CASE WHEN nw > 0 THEN nalpha / nw ELSE 0.0 END AS alphar
    FROM feat
)
SELECT doc_id, CAST(nw AS INTEGER) AS n_words,
       (nw >= 50 AND nw <= 100000) AS flag_word_count,
       (mwl >= 3.0 AND mwl <= 10.0) AS flag_mean_word_len,
       (symr <= 0.1) AS flag_symbol_ratio,
       (bulf <= 0.9) AS flag_bullet_lines,
       (ellf <= 0.3) AS flag_ellipsis_lines,
       (repf <= 0.3) AS flag_repeated_lines,
       (alphar >= 0.8) AS flag_alpha_words,
       (nstop >= 2) AS flag_stopwords,
       ((nw >= 50 AND nw <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
        AND (symr <= 0.1) AND (bulf <= 0.9) AND (ellf <= 0.3)
        AND (repf <= 0.3) AND (alphar >= 0.8) AND (nstop >= 2))
           AS pass_quality
FROM r"""
    o["doc_quality_flags"] = _qflags_sql

    # per-source rollup of the same flags: the source-level junk table a
    # 100 TB operator filters on (integer 0/1 sums -> exact averages)
    o["source_quality_report"] = f"""
WITH q AS ({_qflags_sql})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(CASE WHEN q.pass_quality THEN 1.0 ELSE 0.0 END), 6)
           AS pass_rate,
       round(avg(CASE WHEN q.flag_word_count THEN 1.0 ELSE 0.0 END), 6)
           AS rate_word_count,
       round(avg(CASE WHEN q.flag_stopwords THEN 1.0 ELSE 0.0 END), 6)
           AS rate_stopwords,
       round(avg(CASE WHEN q.flag_alpha_words THEN 1.0 ELSE 0.0 END), 6)
           AS rate_alpha_words,
       round(avg(q.n_words), 2) AS mean_words
FROM q JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source"""

    fp = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
    o["doc_fingerprints"] = f"SELECT doc_id, {fp} AS fingerprint FROM documents"

    o["dedup_exact"] = f"""
WITH fp AS (SELECT doc_id AS id, {fp} AS fingerprint FROM documents)
SELECT fingerprint, min(id) AS canonical_id,
       CAST(count(*) AS BIGINT) AS group_size,
       array_to_string(list_transform(
           (list_sort(list(id)))[1:100], x -> CAST(x AS VARCHAR)), ',')
         AS member_csv  -- mirrors the Spark side's max_members=100 cap
FROM fp GROUP BY fingerprint HAVING count(*) > 1"""

    from engine.datawork.dedup import MINHASH_BANDS, MINHASH_K
    _rows_per_band = MINHASH_K // MINHASH_BANDS
    # concat_ws (variadic) — a 64-way `||` chain overflows DuckDB's binder
    # recursion limit; Spark's concat_ws('|', ...) is the same function
    _sig_concat = "concat_ws('|', " + ", ".join(
        f"mh{i}" for i in range(MINHASH_K)) + ")"
    o["dedup_minhash_sigs"] = _minhash_sig_sql() + f"""
SELECT id AS doc_id, md5({_sig_concat}) AS sig_md5 FROM sig"""

    band_rows = "\n    UNION ALL\n    ".join(
        "SELECT id, {b} AS band, md5({cols}) AS bucket FROM sig".format(
            b=b, cols=" || '|' || ".join(
                f"mh{b * _rows_per_band + r}" for r in range(_rows_per_band)))
        for b in range(MINHASH_BANDS))
    o["dedup_minhash_pairs"] = _minhash_sig_sql() + f""",
buckets_raw AS (
    {band_rows}
),
buckets AS (  -- same max_bucket=100 skew guard as the Spark side
    SELECT id, band, bucket FROM buckets_raw
    QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 100
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM buckets a JOIN buckets b
  ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
ORDER BY id_a, id_b"""

    _est_matches = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END"
        for i in range(MINHASH_K))
    o["dedup_minhash_verified"] = _minhash_sig_sql() + f""",
buckets_raw AS (
    {band_rows}
),
buckets AS (
    SELECT id, band, bucket FROM buckets_raw
    QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 100
),
pairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
)
SELECT id_a, id_b, est_jaccard FROM (
    SELECT p.id_a, p.id_b,
           CAST(round(({_est_matches}) / {MINHASH_K}.0, 6) AS DOUBLE)
               AS est_jaccard
    FROM pairs p
    JOIN sig a ON a.id = p.id_a
    JOIN sig b ON b.id = p.id_b
) WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b"""

    # incremental dedup: the Spark side runs wave-vs-persisted-index; the
    # oracle is the FULL recompute over old ∪ new restricted to pairs
    # touching the wave (hash-split % 10 >= 8) — the incremental module's
    # exactness contract (combined-occupancy hot-bucket guard) makes the
    # two identical by construction, and this oracle PINS that contract.
    def _in_wave(c: str) -> str:
        return (f"(CAST(('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 8)) "
                f"AS BIGINT) % 10 >= 8)")
    o["dedup_incremental"] = _minhash_sig_sql() + f""",
buckets_raw AS (
    {band_rows}
),
buckets AS (
    SELECT id, band, bucket FROM buckets_raw
    QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 100
),
pairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
est AS (
    SELECT p.id_a, p.id_b,
           CAST(round(({_est_matches}) / {MINHASH_K}.0, 6) AS DOUBLE)
               AS est_jaccard
    FROM pairs p
    JOIN sig a ON a.id = p.id_a
    JOIN sig b ON b.id = p.id_b
)
SELECT id_a, id_b, est_jaccard,
       CASE WHEN {_in_wave('id_a')} AND {_in_wave('id_b')}
            THEN 'new_new' ELSE 'new_old' END AS origin
FROM est
WHERE est_jaccard >= 0.5
  AND ({_in_wave('id_a')} OR {_in_wave('id_b')})
ORDER BY id_a, id_b"""

    # streamed-ingest dedup: the union of per-wave pair sets partitions
    # the FULL pair set (a pair lands at its later member's wave), so the
    # oracle is the plain full-corpus recompute; origin = same-wave test
    # under the query's wave rule (doc_id % 3). Cap pinned at 100000 on
    # both sides (no bucket may cross it between waves — the operator's
    # exactness caveat).
    def _wave3(c: str) -> str:
        return f"(CAST({c} AS BIGINT) % 3)"
    o["dedup_stream_ingest"] = _minhash_sig_sql() + f""",
buckets_raw AS (
    {band_rows}
),
buckets AS (
    SELECT id, band, bucket FROM buckets_raw
    QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 100000
),
pairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
est AS (
    SELECT p.id_a, p.id_b,
           CAST(round(({_est_matches}) / {MINHASH_K}.0, 6) AS DOUBLE)
               AS est_jaccard
    FROM pairs p
    JOIN sig a ON a.id = p.id_a
    JOIN sig b ON b.id = p.id_b
)
SELECT id_a, id_b, est_jaccard,
       CASE WHEN {_wave3('id_a')} = {_wave3('id_b')}
            THEN 'new_new' ELSE 'new_old' END AS origin
FROM est
WHERE est_jaccard >= 0.5
ORDER BY id_a, id_b"""

    o["dedup_ngram_jaccard"] = f"""
WITH {_SHINGLES},
sizes AS (SELECT id, count(*) AS sz FROM shingles GROUP BY id),
cold AS (  -- mirror the Spark side's max_df=1000 hot-shingle drop
    SELECT id, sh FROM shingles
    QUALIFY count(*) OVER (PARTITION BY sh) <= 1000
),
inter AS (
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
    FROM cold a JOIN cold b ON a.sh = b.sh AND a.id < b.id
    GROUP BY 1, 2
)
SELECT id_a, id_b, jaccard FROM (
    SELECT id_a, id_b,
           CAST(round(inter / (sa.sz + sb.sz - inter), 6) AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
) WHERE jaccard >= 0.5
ORDER BY id_a, id_b"""

    o["dedup_ngram_containment"] = f"""
WITH {_SHINGLES},
sizes AS (SELECT id, count(*) AS sz FROM shingles GROUP BY id),
cold AS (
    SELECT id, sh FROM shingles
    QUALIFY count(*) OVER (PARTITION BY sh) <= 1000
),
inter AS (
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
    FROM cold a JOIN cold b ON a.sh = b.sh AND a.id < b.id
    GROUP BY 1, 2
),
bt AS (  -- "both" is a DuckDB keyword (TRIM ... BOTH)
    SELECT id_a, id_b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
           CAST(round(inter / (sa.sz + sb.sz - inter), 6) AS DOUBLE)
               AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
)
SELECT id_contained, id_container, containment, jaccard FROM (
    SELECT id_a AS id_contained, id_b AS id_container,
           CAST(round(inter / sz_a, 6) AS DOUBLE) AS containment, jaccard
    FROM bt
    UNION ALL
    SELECT id_b, id_a, CAST(round(inter / sz_b, 6) AS DOUBLE), jaccard
    FROM bt
) WHERE containment >= 0.5
ORDER BY id_contained, id_container"""

    o["dedup_simhash"] = _simhash_core() + """
SELECT id AS doc_id, simhash FROM sh"""

    piece_rows = "\n    UNION ALL\n    ".join(
        f"SELECT id, simhash, {b} AS band, (simhash >> {b * 8}) & 255 AS piece FROM sh"
        for b in range(4))
    o["dedup_simhash_pairs"] = _simhash_core() + f""",
pieces AS (
    {piece_rows}
)
SELECT id_a, id_b, hamming FROM (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM pieces a JOIN pieces b
      ON a.band = b.band AND a.piece = b.piece AND a.id < b.id
) WHERE hamming <= 3 ORDER BY id_a, id_b"""

    o["dedup_clusters"] = _minhash_sig_sql() + f""",
buckets_raw AS (
    {band_rows}
),
buckets AS (
    SELECT id, band, bucket FROM buckets_raw
    QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 100
),
pairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION SELECT id_b, id_a FROM pairs
),
reach AS (
    WITH RECURSIVE r(src, dst) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
    ) SELECT * FROM r
)
SELECT src AS doc_id, min(dst) AS cluster_id
FROM reach GROUP BY src ORDER BY doc_id"""

    # dedup ACTION: clusters (same CTE chain as dedup_clusters), then keep
    # docs that are unclustered or are their cluster's canonical (min id)
    o["dedup_apply"] = _minhash_sig_sql() + f""",
buckets_raw AS (
    {band_rows}
),
buckets AS (
    SELECT id, band, bucket FROM buckets_raw
    QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 100
),
pairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION SELECT id_b, id_a FROM pairs
),
reach AS (
    WITH RECURSIVE r(src, dst) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
    ) SELECT * FROM r
),
losers AS (
    SELECT src AS doc_id FROM reach GROUP BY src
    HAVING src != min(dst)
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
WHERE l.doc_id IS NULL"""

    # layered dedup ACTION: near-dup cluster losers (same chain as
    # dedup_apply) UNION exact-fingerprint losers — replica groups past the
    # LSH bucket guard never produce candidates and are owned by the exact
    # pass (see BENCH/BASELINE.md sf1 soak)
    o["dedup_apply_full"] = _minhash_sig_sql() + f""",
buckets_raw AS (
    {band_rows}
),
buckets AS (
    SELECT id, band, bucket FROM buckets_raw
    QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 100
),
pairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION SELECT id_b, id_a FROM pairs
),
reach AS (
    WITH RECURSIVE r(src, dst) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
    ) SELECT * FROM r
),
near_losers AS (
    SELECT src AS doc_id FROM reach GROUP BY src
    HAVING src != min(dst)
),
fp AS (SELECT doc_id AS id, {fp} AS fingerprint FROM documents),
exact_losers AS (
    SELECT id AS doc_id FROM (
        SELECT id, min(id) OVER (PARTITION BY fingerprint) AS canon FROM fp
    ) WHERE id != canon
),
losers AS (
    SELECT doc_id FROM near_losers UNION SELECT doc_id FROM exact_losers
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
WHERE l.doc_id IS NULL"""

    # ---- the COMPOSED curation funnel (quality → layered dedup →
    # decontamination → temperature sample) as ONE CTE chain, reusing the
    # exact spellings of doc_quality_flags / dedup_apply_full /
    # corpus_decontaminate / corpus_temperature_sample over the staged
    # relations — value equality checks the composition end to end
    _ppm_b = ("CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
              "AS BIGINT)")
    _qpred = ("(nw >= 50 AND nw <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)"
              " AND (symr <= 0.1) AND (bulf <= 0.9) AND (ellf <= 0.3)"
              " AND (repf <= 0.3) AND (alphar >= 0.8) AND (nstop >= 2)")
    _funnel = f"""
WITH corpus AS (
    SELECT * FROM documents WHERE {_ppm_b} % 100 >= 5
), bench AS (
    SELECT * FROM documents WHERE {_ppm_b} % 100 < 5
), qbase AS (
    SELECT doc_id,
           {_WORDS} AS ws,
           string_split(text, chr(10)) AS lines,
           CASE WHEN trim(text) = '' THEN 0 ELSE len({_WORDS}) END AS nw,
           coalesce(list_sum(list_transform({_WORDS}, x -> length(x))), 0) AS sl,
           len(regexp_extract_all(text, '{SYMBOL_RE}')) AS nsym
    FROM corpus
), qfeat AS (
    SELECT doc_id, nw,
           CASE WHEN nw > 0 THEN sl / nw ELSE 0.0 END AS mwl,
           CASE WHEN nw > 0 THEN nsym / nw ELSE 0.0 END AS symr,
           len(lines) AS nl,
           len(list_filter(lines, l -> regexp_matches(l, '{BULLET_LINE_RE}'))) AS nbul,
           len(list_filter(lines, l -> regexp_matches(l, '{ELLIPSIS_END_RE}'))) AS nell,
           list_filter(list_transform(lines, l -> trim(l)), l -> l != '') AS nb,
           len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS nalpha,
           len(list_intersect(list_distinct(ws), {stops_en})) AS nstop
    FROM qbase
), qr AS (
    SELECT doc_id, nw, mwl, symr, nstop,
           CASE WHEN nl > 0 THEN nbul / nl ELSE 0.0 END AS bulf,
           CASE WHEN nl > 0 THEN nell / nl ELSE 0.0 END AS ellf,
           CASE WHEN len(nb) > 0
                THEN (len(nb) - len(list_distinct(nb))) / len(nb)
                ELSE 0.0 END AS repf,
           CASE WHEN nw > 0 THEN nalpha / nw ELSE 0.0 END AS alphar
    FROM qfeat
), qsrc AS (
    SELECT c.* FROM corpus c JOIN qr USING (doc_id) WHERE {_qpred}
), {_minhash_sig_sql(src='qsrc', lead='').lstrip()},
buckets_raw AS (
    {band_rows}
),
buckets AS (
    SELECT id, band, bucket FROM buckets_raw
    QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 100
),
pairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION SELECT id_b, id_a FROM pairs
),
reach AS (
    WITH RECURSIVE r(src, dst) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
    ) SELECT * FROM r
),
near_losers AS (
    SELECT src AS doc_id FROM reach GROUP BY src
    HAVING src != min(dst)
),
qfp AS (SELECT doc_id AS id, {fp} AS fingerprint FROM qsrc),
exact_losers AS (
    SELECT id AS doc_id FROM (
        SELECT id, min(id) OVER (PARTITION BY fingerprint) AS canon FROM qfp
    ) WHERE id != canon
),
losers AS (
    SELECT doc_id FROM near_losers UNION SELECT doc_id FROM exact_losers
),
ddup AS (
    SELECT q.* FROM qsrc q LEFT JOIN losers l ON q.doc_id = l.doc_id
    WHERE l.doc_id IS NULL
),
bsh AS (
    SELECT DISTINCT sh
    FROM (SELECT {_WORDS} AS ws FROM bench) w,
         UNNEST(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                               i -> array_to_string(ws[i:i+2], ' '))) AS t(sh)
),
contam AS (
    SELECT s.id, count(*) AS n_grams, count(b.sh) AS n_hits
    FROM shingles s JOIN ddup d ON s.id = d.doc_id
    LEFT JOIN bsh b ON s.sh = b.sh
    GROUP BY s.id
),
decon_drop AS (
    SELECT id FROM contam
    WHERE round(CAST(n_hits AS DOUBLE) / n_grams, 6) >= 0.05
),
clean AS (
    SELECT d.* FROM ddup d LEFT JOIN decon_drop x ON d.doc_id = x.id
    WHERE x.id IS NULL
),
gW AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_group FROM clean
       GROUP BY lang),
sW AS (SELECT lang, n_group, CAST(floor(sqrt(n_group)) AS BIGINT) AS s
       FROM gW),
dW AS (SELECT CAST(sum(s) AS BIGINT) AS denom FROM sW),
cW AS (SELECT lang, n_group,
              least(CAST(1000000 AS BIGINT),
                    (1000000 * 60 * s) // (denom * n_group)) AS cut_ppm
       FROM sW, dW),
sampled AS (
    SELECT doc_id, clean.lang, n_group, cut_ppm
    FROM clean JOIN cW USING (lang)
    WHERE {_ppm_b} % 1000000 < cut_ppm
)"""
    # MATERIALIZED on every multi-referenced heavy CTE: DuckDB inlines
    # CTEs by default, so the shingle+64-min-hash chain would otherwise be
    # re-evaluated up to 16x (once per band_rows branch) and again for
    # every funnel-count subquery — measured 239 s → 0.8 s at sf0.01
    for _cte in ("qsrc", "shingles", "sig", "ddup", "clean"):
        _funnel = _funnel.replace(f"{_cte} AS (", f"{_cte} AS MATERIALIZED (")
    o["corpus_curate"] = _funnel + """
SELECT doc_id, lang, n_group, cut_ppm FROM sampled"""
    o["corpus_curate_funnel"] = _funnel + """
SELECT * FROM (
    SELECT 0 AS stage_idx, 'input' AS stage,
           CAST((SELECT count(*) FROM corpus) AS BIGINT) AS n_docs
    UNION ALL SELECT 1, 'quality',
           CAST((SELECT count(*) FROM qsrc) AS BIGINT)
    UNION ALL SELECT 2, 'dedup',
           CAST((SELECT count(*) FROM ddup) AS BIGINT)
    UNION ALL SELECT 3, 'decontaminated',
           CAST((SELECT count(*) FROM clean) AS BIGINT)
    UNION ALL SELECT 4, 'sampled',
           CAST((SELECT count(*) FROM sampled) AS BIGINT)
) ORDER BY stage_idx"""

    o["token_vocab_topk"] = f"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT doc_id, {_WORDS} AS ws FROM documents
      WHERE trim(text) != '') w,
     UNNEST(ws) AS t(token)
GROUP BY token
ORDER BY n DESC, token LIMIT 200"""

    o["corpus_sample"] = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      % 100 < 10"""

    o["doc_length_quantiles"] = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(n_chars, 0.5), 4) AS p50,
       round(quantile_cont(n_chars, 0.9), 4) AS p90,
       round(quantile_cont(n_chars, 0.99), 4) AS p99
FROM documents GROUP BY lang"""

    # the oracle is the naive one-stream window; the engine side is the
    # two-level distributed prefix sum — value equality IS the check that
    # the distributed formulation computes the same stream. Token counts
    # are REAL BPE (frozen merges): DuckDB can't run the merges kernel,
    # so the committed expected_docs_bpe table (produced by the same
    # Spark-free engine/core/bpe.py the UDF wraps) supplies its counts.
    o["corpus_pack_shards"] = f"""
WITH t AS (
    SELECT d.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens
    FROM documents d
    JOIN {exp('expected_docs_bpe')} b USING (doc_id)
), c AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(sum(n_tokens) OVER (
                ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_offset
    FROM t
)
SELECT doc_id, n_tokens, start_offset,
       CAST(floor(start_offset / 2048.0) AS INTEGER) AS shard_id
FROM c"""

    # line dedup over the same deterministic banner derivation the Spark
    # side plants (__spark_entry__._banner_corpus) — string_agg skips the
    # CASE-NULLed hot lines exactly like the filtered collect_list
    o["corpus_line_dedup"] = """
WITH src AS (
    SELECT doc_id,
           text || chr(10) || 'banner-' || CAST(doc_id % 7 AS VARCHAR) ||
           CASE WHEN doc_id % 3 = 0
                THEN chr(10) || 'rare-' || CAST(doc_id AS VARCHAR)
                ELSE '' END AS text
    FROM documents
), l AS (
    SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls FROM src
), e AS (
    SELECT doc_id, i AS pos, ls[i] AS line
    FROM l, UNNEST(range(1, len(ls) + 1)) AS t(i)
), hot AS (
    SELECT line FROM e WHERE trim(line) <> ''
    GROUP BY line HAVING count(*) >= 5
)
SELECT e.doc_id,
       coalesce(string_agg(CASE WHEN h.line IS NULL THEN e.line END,
                           chr(10) ORDER BY e.pos), '') AS text,
       CAST(count(CASE WHEN h.line IS NULL THEN 1 END) AS BIGINT) AS n_kept,
       CAST(count(h.line) AS BIGINT) AS n_dropped
FROM e LEFT JOIN hot h ON e.line = h.line
GROUP BY e.doc_id"""

    o["corpus_line_dedup_report"] = """
WITH src AS (
    SELECT doc_id,
           text || chr(10) || 'banner-' || CAST(doc_id % 7 AS VARCHAR) ||
           CASE WHEN doc_id % 3 = 0
                THEN chr(10) || 'rare-' || CAST(doc_id AS VARCHAR)
                ELSE '' END AS text
    FROM documents
), l AS (
    SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls FROM src
), e AS (
    SELECT ls[i] AS line
    FROM l, UNNEST(range(1, len(ls) + 1)) AS t(i)
), cnts AS (
    SELECT line, count(*) AS cnt FROM e
    WHERE trim(line) <> '' GROUP BY line
)
SELECT 'line_freq' AS guard,
       CAST(5 AS INTEGER) AS threshold,
       CAST(count(CASE WHEN cnt >= 5 THEN 1 END) AS BIGINT) AS hot_lines,
       CAST(coalesce(sum(CASE WHEN cnt >= 5 THEN cnt END), 0) AS BIGINT)
           AS dropped_rows,
       CAST(coalesce(max(cnt), 0) AS BIGINT) AS max_line_count
FROM cnts"""

    # exact-substring dedup over the same deterministic boilerplate
    # derivation the Spark side plants (__spark_entry__._boiler_corpus).
    # g is referenced twice (hot + dup) and tk twice — MATERIALIZED, or
    # DuckDB re-evaluates the window explode per reference.
    _boiler_tk = """
WITH src AS (
    SELECT doc_id,
           text || ' lead-' || CAST(doc_id AS VARCHAR) || ' terms-' ||
           CAST(doc_id % 5 AS VARCHAR) ||
           ' of service apply to all posted content' ||
           CASE WHEN doc_id % 4 = 0
                THEN ' mid-' || CAST(doc_id AS VARCHAR) || ' terms-' ||
                     CAST(doc_id % 5 AS VARCHAR) ||
                     ' of service apply to all posted content'
                ELSE '' END AS text
    FROM documents
), tk AS MATERIALIZED (
    SELECT doc_id,
           list_filter(string_split_regex(trim(coalesce(text, '')),
                                          '\\s+'),
                       t -> t <> '') AS toks
    FROM src
)"""

    def _gram_cte(k: int) -> str:
        return f""", g AS MATERIALIZED (
    SELECT doc_id, i - 1 AS s,
           md5(array_to_string(toks[i:i+{k - 1}], ' ')) AS gram
    FROM tk, UNNEST(range(1, greatest(len(toks) - {k - 1}, 0) + 1))
         AS t(i)
)"""

    _sub_prefix = _boiler_tk + _gram_cte(6) + """, hot AS (
    SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
), dup AS (
    SELECT g.doc_id, g.s FROM g JOIN hot USING (gram)
), m AS (
    SELECT doc_id, s,
           CASE WHEN s > coalesce(max(s + 6) OVER (
                    PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1)
                THEN 1 ELSE 0 END AS is_new
    FROM dup
), sp0 AS (
    SELECT doc_id, s,
           sum(is_new) OVER (PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS span_id
    FROM m
), sp AS (
    SELECT doc_id, CAST(min(s) AS INTEGER) AS span_start,
           CAST(max(s) + 6 AS INTEGER) AS span_end,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM sp0 GROUP BY doc_id, span_id
)"""

    o["dedup_substring_spans"] = _sub_prefix + """
SELECT sp.doc_id, span_start, span_end, n_windows,
       array_to_string(tk.toks[span_start + 1:span_end], ' ')
           AS span_text
FROM sp JOIN tk USING (doc_id)"""

    o["dedup_substring_apply"] = _sub_prefix + """, e AS (
    SELECT doc_id, i - 1 AS pos, toks[i] AS tok
    FROM tk, UNNEST(range(1, len(toks) + 1)) AS t(i)
), agg AS (
    SELECT e.doc_id,
           coalesce(string_agg(
               CASE WHEN sp.doc_id IS NULL THEN e.tok END,
               ' ' ORDER BY e.pos), '') AS text,
           CAST(count(CASE WHEN sp.doc_id IS NULL THEN 1 END) AS BIGINT)
               AS n_kept,
           CAST(count(sp.doc_id) AS BIGINT) AS n_dropped
    FROM e LEFT JOIN sp ON e.doc_id = sp.doc_id
                       AND e.pos >= sp.span_start AND e.pos < sp.span_end
    GROUP BY e.doc_id
)
SELECT s.doc_id, coalesce(a.text, '') AS text,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(a.n_dropped, 0) AS BIGINT) AS n_dropped
FROM src s LEFT JOIN agg a USING (doc_id)"""

    # winnowing (MOSS) fingerprints over the same boiler derivation;
    # pick = min(gram || zero-padded pos) over each complete w=5 window
    # of k=4-gram hashes — fixed-width hex makes string order ==
    # (hash, pos) order in both engines
    _winnow_sel = _boiler_tk + _gram_cte(4) + """, sel AS (
    SELECT DISTINCT doc_id,
           CAST(substr(pick, 33, 10) AS INTEGER) AS pos,
           substr(pick, 1, 32) AS gram
    FROM (
        SELECT doc_id, s,
               min(gram || lpad(CAST(s AS VARCHAR), 10, '0')) OVER (
                   PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS pick,
               max(s) OVER (PARTITION BY doc_id) AS max_s
        FROM g)
    WHERE s <= max_s - 4
)"""

    o["winnow_fingerprints"] = _winnow_sel + """
SELECT doc_id, pos, gram FROM sel"""

    o["winnow_similar_pairs"] = _winnow_sel + """, fp AS (
    SELECT DISTINCT doc_id AS id, gram FROM sel
), keep AS (
    SELECT gram FROM fp GROUP BY gram
    HAVING count(*) BETWEEN 2 AND 1000
), fpk AS MATERIALIZED (
    SELECT fp.id, fp.gram FROM fp JOIN keep USING (gram)
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fpk a JOIN fpk b ON a.gram = b.gram AND a.id < b.id
GROUP BY a.id, b.id HAVING count(*) >= 2"""

    # surgical decontamination: same bench/corpus split + phrase planting
    # as the Spark side; hashes lower() (case-insensitive match), cut
    # addresses original tokens
    o["corpus_decontaminate_spans"] = """
WITH bench AS (
    SELECT doc_id,
           text || ' the quick eval answer is forty two exactly' AS text
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 100 < 5
), corpus AS (
    SELECT doc_id,
           CASE WHEN doc_id % 6 = 0
                THEN text ||
                     ' the quick eval answer is forty two exactly'
                ELSE text END AS text
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 100 >= 5
), btk AS (
    SELECT list_filter(string_split_regex(trim(coalesce(text, '')),
                                          '\\s+'),
                       t -> t <> '') AS toks
    FROM bench
), bg AS (
    SELECT DISTINCT md5(lower(array_to_string(toks[i:i+5], ' ')))
               AS gram
    FROM btk, UNNEST(range(1, greatest(len(toks) - 5, 0) + 1)) AS t(i)
), tk AS MATERIALIZED (
    SELECT doc_id,
           list_filter(string_split_regex(trim(coalesce(text, '')),
                                          '\\s+'),
                       t -> t <> '') AS toks
    FROM corpus
), g AS (
    SELECT doc_id, i - 1 AS s,
           md5(lower(array_to_string(toks[i:i+5], ' '))) AS gram
    FROM tk, UNNEST(range(1, greatest(len(toks) - 5, 0) + 1)) AS t(i)
), dup AS (
    SELECT g.doc_id, g.s FROM g JOIN bg USING (gram)
), m AS (
    SELECT doc_id, s,
           CASE WHEN s > coalesce(max(s + 6) OVER (
                    PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1)
                THEN 1 ELSE 0 END AS is_new
    FROM dup
), sp0 AS (
    SELECT doc_id, s,
           sum(is_new) OVER (PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS span_id
    FROM m
), sp AS (
    SELECT doc_id, CAST(min(s) AS INTEGER) AS span_start,
           CAST(max(s) + 6 AS INTEGER) AS span_end
    FROM sp0 GROUP BY doc_id, span_id
), e AS (
    SELECT doc_id, i - 1 AS pos, toks[i] AS tok
    FROM tk, UNNEST(range(1, len(toks) + 1)) AS t(i)
), agg AS (
    SELECT e.doc_id,
           coalesce(string_agg(
               CASE WHEN sp.doc_id IS NULL THEN e.tok END,
               ' ' ORDER BY e.pos), '') AS text,
           CAST(count(CASE WHEN sp.doc_id IS NULL THEN 1 END) AS BIGINT)
               AS n_kept,
           CAST(count(sp.doc_id) AS BIGINT) AS n_dropped
    FROM e LEFT JOIN sp ON e.doc_id = sp.doc_id
                       AND e.pos >= sp.span_start AND e.pos < sp.span_end
    GROUP BY e.doc_id
)
SELECT c.doc_id, coalesce(a.text, '') AS text,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(a.n_dropped, 0) AS BIGINT) AS n_dropped
FROM corpus c LEFT JOIN agg a USING (doc_id)"""

    o["corpus_decontaminate"] = """
WITH corpus AS (
    SELECT * FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 100 >= 5
), bench AS (
    SELECT * FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 100 < 5
), cg AS (
    SELECT DISTINCT doc_id AS id, sh
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
          FROM corpus) w,
         UNNEST(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                               i -> array_to_string(ws[i:i+2], ' '))) AS t(sh)
), bg AS (
    SELECT DISTINCT sh
    FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS ws
          FROM bench) w,
         UNNEST(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                               i -> array_to_string(ws[i:i+2], ' '))) AS t(sh)
)
SELECT id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(b.sh) AS BIGINT) AS n_hits,
       round(CAST(count(b.sh) AS DOUBLE) / count(*), 6) AS hit_ratio
FROM cg LEFT JOIN bg b USING (sh)
GROUP BY id HAVING count(b.sh) > 0"""

    # closed-form prediction of the PPM decode: the Spark side parses real
    # bytes; matching these analytic values proves the parser recovered
    # the planted pixels. Byte counts: header 'P6\\n4 3\\n255\\n' = 11,
    # raster 3*4*3 = 36 (good) / 33 (truncated), 'PNGJUNKBYTES' = 12.
    o["multimodal_ppm_decode"] = """
SELECT 'asset-' || CAST(doc_id AS VARCHAR) AS asset_id,
       CAST(CASE WHEN doc_id % 10 = 0 THEN 12
                 WHEN doc_id % 10 = 5 THEN 44
                 ELSE 47 END AS BIGINT) AS n_bytes,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL ELSE 4 END AS img_width,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL ELSE 3 END AS img_height,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
            ELSE CAST(doc_id % 256 AS DOUBLE) END AS mean_r,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
            ELSE CAST((doc_id * 7) % 256 AS DOUBLE) END AS mean_g,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
            ELSE CAST((doc_id * 13) % 256 AS DOUBLE) END AS mean_b,
       CASE WHEN doc_id % 10 = 0
            THEN 'NotImplementedError: no image/png codec in this ' ||
                 'environment — swap in a real decoder here'
            WHEN doc_id % 10 = 5
            THEN 'ValueError: truncated PPM pixel data'
            ELSE NULL END AS error
FROM documents"""

    # closed-form WAV oracle: v_i = ((doc_id*31 + i*7) % 512) - 256
    _wav_abs = ("list_transform(range(0, 8), "
                "i -> abs(((doc_id*31 + i*7) % 512) - 256))")
    o["multimodal_wav_decode"] = f"""
SELECT 'wav-' || CAST(doc_id AS VARCHAR) AS asset_id,
       CAST(CASE WHEN doc_id % 10 = 0 THEN 12
                 WHEN doc_id % 10 = 5 THEN 59 ELSE 60 END AS BIGINT)
           AS n_bytes,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
            ELSE 8000 END AS sample_rate,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL ELSE 1 END AS n_channels,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
            ELSE CAST(8 AS BIGINT) END AS n_frames,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
            ELSE CAST(1 AS BIGINT) END AS duration_ms,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
            ELSE CAST(list_max({_wav_abs}) AS INTEGER) END AS peak,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
            ELSE round(list_sum({_wav_abs}) / 8.0, 6) END AS mean_abs,
       CASE WHEN doc_id % 10 = 0
            THEN 'NotImplementedError: no audio/mpeg codec in this ' ||
                 'environment — swap in a real decoder here'
            WHEN doc_id % 10 = 5
            THEN 'ValueError: truncated WAV data chunk'
            ELSE NULL END AS error
FROM documents"""

    # closed-form GIF oracle: k = 1 + doc_id%4 frames of 14 bytes each,
    # header 13 + extension 8 + trailer 1
    o["multimodal_gif_meta"] = """
SELECT 'gif-' || CAST(doc_id AS VARCHAR) AS asset_id,
       CAST(CASE WHEN doc_id % 10 = 0 THEN 12
                 WHEN doc_id % 10 = 5 THEN 21 + 14 * (1 + doc_id % 4)
                 ELSE 22 + 14 * (1 + doc_id % 4) END AS BIGINT) AS n_bytes,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL ELSE 4 END AS width,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL ELSE 3 END AS height,
       CASE WHEN doc_id % 10 IN (0, 5) THEN NULL
            ELSE CAST(1 + doc_id % 4 AS INTEGER) END AS n_frames,
       CASE WHEN doc_id % 10 = 0
            THEN 'NotImplementedError: no image/png codec in this ' ||
                 'environment — swap in a real decoder here'
            WHEN doc_id % 10 = 5
            THEN 'ValueError: GIF ended without trailer'
            ELSE NULL END AS error
FROM documents"""

    o["events_rolling_7d"] = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, count(*) AS n, sum(value) AS v
    FROM events GROUP BY 1
)
SELECT day,
       CAST(n AS BIGINT) AS n_day,
       CAST(sum(n) OVER w AS BIGINT) AS n_7d,
       round(sum(v) OVER w, 4) AS value_7d
FROM daily
WINDOW w AS (ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
ORDER BY day"""

    # exact sequential funnel: list aggregation + min-after array algebra;
    # the max_events=48 hot-entity guard excludes users with more than 48
    # funnel-step events BEFORE aggregation (identical to the operator's
    # broadcast anti-join), so the cap itself sits under the gate
    o["events_funnel"] = """
WITH capped AS (
    SELECT user_id, event_type, ts
    FROM events WHERE event_type IN ('view', 'click', 'purchase')
    QUALIFY count(*) OVER (PARTITION BY user_id) <= 48
), per_user AS (
    SELECT user_id,
           list_sort(list(ts) FILTER (event_type = 'view')) AS v,
           list_sort(list(ts) FILTER (event_type = 'click')) AS c,
           list_sort(list(ts) FILTER (event_type = 'purchase')) AS p
    FROM capped GROUP BY user_id
), stepped AS (
    SELECT v[1] AS t1,
           list_filter(c, x -> x > v[1])[1] AS t2,
           list_filter(p, x -> x > list_filter(c, y -> y > v[1])[1])[1]
               AS t3
    FROM per_user
)
SELECT CAST(count(t1) AS BIGINT) AS n_view,
       CAST(count(t2) AS BIGINT) AS n_view_click,
       CAST(count(t3) AS BIGINT) AS n_view_click_purchase
FROM stepped"""

    o["events_funnel_census"] = """
WITH per AS (
    SELECT user_id, count(*) AS ne
    FROM events WHERE event_type IN ('view', 'click', 'purchase')
    GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_entities,
       CAST(count(CASE WHEN ne > 48 THEN 1 END) AS BIGINT) AS n_capped,
       CAST(coalesce(sum(CASE WHEN ne > 48 THEN ne END), 0) AS BIGINT)
           AS capped_events
FROM per"""

    o["events_pivot_daily"] = """
SELECT CAST(ts AS DATE) AS day,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
           AS n_purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY 1 ORDER BY 1"""

    o["events_stream_join"] = """
SELECT c.user_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(sum(p.value), 4) AS purchase_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
GROUP BY c.user_id
ORDER BY c.user_id"""

    o["events_stream_enrich"] = """
SELECT CAST(c.c_nationkey AS INTEGER) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 4) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1 ORDER BY 1"""

    o["events_interval_join"] = """
WITH iv AS (
    SELECT user_id AS iv_user, CAST(ts AS DATE) AS day,
           min(ts) AS ts_start, max(ts) AS ts_end
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT event_id, iv_user, day
FROM events e JOIN iv ON e.ts BETWEEN iv.ts_start AND iv.ts_end
WHERE e.event_type = 'click'
ORDER BY event_id, iv_user, day"""

    o["doc_tfidf_top_terms"] = """
WITH tok AS (
    SELECT doc_id AS id, t.term
    FROM (SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\\s+') AS ws
          FROM documents WHERE trim(text) <> '') w,
         UNNEST(ws) AS t(term)
), tf AS (
    SELECT id, term, CAST(count(*) AS BIGINT) AS tf
    FROM tok GROUP BY id, term
), df AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
    SELECT id, tf.term, tf,
           round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1), 6) AS score
    FROM tf JOIN df USING (term), n
), ranked AS (
    SELECT id, term, tf, score,
           CAST(row_number() OVER (PARTITION BY id
                                   ORDER BY score DESC, term) AS INTEGER)
               AS rank
    FROM scored
)
SELECT id AS doc_id, term, tf, score, rank FROM ranked WHERE rank <= 5"""

    o["doc_unigram_nll"] = """
WITH tok AS (
    SELECT doc_id AS id, t.term
    FROM (SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\\s+') AS ws
          FROM documents WHERE trim(text) <> '') w,
         UNNEST(ws) AS t(term)
), cnt AS (
    SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY term
), s AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS total,
           CAST(count(*) AS BIGINT) AS vocab FROM cnt
), scored AS (
    SELECT id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(-avg(ln((cnt + 1.0) / (total + vocab))), 6) AS nll
    FROM tok JOIN cnt USING (term), s
    GROUP BY id
)
SELECT doc_id, n_tokens, nll
FROM documents LEFT JOIN scored ON scored.id = documents.doc_id"""

    o["corpus_stratified_sample"] = """
SELECT doc_id, text, lang, source, n_chars FROM (
    SELECT *, row_number() OVER (
        PARTITION BY lang
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents)
WHERE rk <= 20"""

    # heavy hitters: the Spark side never builds this histogram (it
    # exact-counts only the MG candidate superset), but the OUTPUT is
    # provably identical to the full GROUP BY — that is the point
    o["corpus_heavy_hitters"] = """
WITH tok AS (
    SELECT t.term
    FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS ws
          FROM documents WHERE trim(text) <> '') w,
         UNNEST(ws) AS t(term)
), s AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM tok
)
SELECT term, CAST(count(*) AS BIGINT) AS cnt
FROM tok, s GROUP BY term, n HAVING count(*) * 31 > n"""

    # CCNet buckets: the doc_unigram_nll chain + per-lang ntile(3);
    # NULLS LAST + doc_id tiebreak pin the ordering (Spark's ascending
    # default is nulls-FIRST — the Spark side pins asc_nulls_last)
    o["doc_ppl_buckets"] = """
WITH tok AS (
    SELECT doc_id AS id, t.term
    FROM (SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\\s+') AS ws
          FROM documents WHERE trim(text) <> '') w,
         UNNEST(ws) AS t(term)
), cnt AS (
    SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY term
), s AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS total,
           CAST(count(*) AS BIGINT) AS vocab FROM cnt
), scored AS (
    SELECT id, round(-avg(ln((cnt + 1.0) / (total + vocab))), 6) AS nll
    FROM tok JOIN cnt USING (term), s
    GROUP BY id
), fulljoin AS (
    SELECT d.doc_id, d.lang, scored.nll
    FROM documents d LEFT JOIN scored ON scored.id = d.doc_id
), tiled AS (
    SELECT doc_id, lang, nll,
           CAST(ntile(3) OVER (PARTITION BY lang
                ORDER BY nll ASC NULLS LAST, doc_id) AS INTEGER)
               AS bucket
    FROM fulljoin
)
SELECT doc_id, lang, nll, bucket,
       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS bucket_label
FROM tiled"""

    # identical PII planting to __spark_entry__.q_doc_pii_redact; the
    # patterns are the RE2/Java common subset from curation.PII_PATTERNS
    o["doc_pii_redact"] = r"""
WITH src AS (
    SELECT doc_id,
           text || ' contact u' || CAST(doc_id AS VARCHAR) ||
           '@example.org via 10.' || CAST(doc_id % 200 AS VARCHAR) ||
           '.0.7 acct 4111222233334444' AS text
    FROM documents
)
SELECT doc_id,
       regexp_replace(
           regexp_replace(
               regexp_replace(coalesce(text, ''),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '[EMAIL]', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
           '\b\d{13,19}\b', '[NUMBER]', 'g') AS text,
       CAST(len(regexp_extract_all(coalesce(text, ''),
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(coalesce(text, ''),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(coalesce(text, ''),
            '\b\d{13,19}\b')) AS BIGINT) AS n_numbers
FROM src"""

    o["corpus_temperature_sample"] = """
WITH g AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_group FROM documents
    GROUP BY lang
), s AS (
    SELECT lang, n_group,
           CAST(floor(sqrt(n_group)) AS BIGINT) AS s FROM g
), d AS (SELECT CAST(sum(s) AS BIGINT) AS denom FROM s),
c AS (
    SELECT lang, n_group,
           least(CAST(1000000 AS BIGINT),
                 (1000000 * 120 * s) // (denom * n_group)) AS cut_ppm
    FROM s, d
)
SELECT doc_id, documents.lang, n_group, cut_ppm
FROM documents JOIN c USING (lang)
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      % 1000000 < cut_ppm"""

    # mixture_sample: explicit weights 8:4:2:1:1 over src0..src4,
    # budget 60, sum_w 16 — mirrors q_corpus_mixture_sample exactly.
    o["corpus_mixture_sample"] = """
WITH w(source, wt) AS (VALUES ('src0', CAST(8 AS BIGINT)), ('src1', 4),
                              ('src2', 2), ('src3', 1), ('src4', 1)),
g AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_group FROM documents
    GROUP BY source
), c AS (
    SELECT g.source, n_group,
           least(CAST(1000000 AS BIGINT),
                 (1000000 * 60 * wt) // (16 * n_group)) AS cut_ppm
    FROM g JOIN w USING (source) WHERE wt > 0
)
SELECT doc_id, documents.source, n_group, cut_ppm
FROM documents JOIN c USING (source)
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      % 1000000 < cut_ppm"""

    o["corpus_splits"] = """
WITH s AS (
    SELECT lang, n_chars,
           CASE WHEN b < 90 * 10000 THEN 'train'
                WHEN b < 95 * 10000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT lang, n_chars,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 1000000 AS b
          FROM documents) t
)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM s GROUP BY lang, split"""

    o["corpus_snapshot_diff"] = """
WITH old AS (
    SELECT doc_id, md5(coalesce(text, '')) AS old_md5
    FROM documents WHERE doc_id % 11 != 5
), new AS (
    SELECT doc_id,
           md5(coalesce(CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]'
                             ELSE text END, '')) AS new_md5
    FROM documents WHERE doc_id % 13 != 4
)
SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old_md5 IS NULL THEN 'added'
            WHEN new_md5 IS NULL THEN 'removed'
            WHEN old_md5 != new_md5 THEN 'changed' END AS status,
       old_md5, new_md5
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
WHERE (old_md5 IS NULL OR new_md5 IS NULL OR old_md5 != new_md5)"""

    from engine.datawork.similarity import (LSH_BANDS as _EB,
                                            LSH_ROWS as _ER)
    o["dedup_guard_report"] = _minhash_sig_sql() + f""",
mbuckets AS (
    {band_rows}
),
mcnt AS (SELECT band, bucket, count(*) AS cnt FROM mbuckets GROUP BY 1, 2),
scnt AS (SELECT md5(sh) AS shd, count(*) AS cnt FROM shingles GROUP BY 1),
ebase AS (
    SELECT vec_id AS id, {_plane_bucket_sql('embedding', _EB * _ER)} AS esig
    FROM embeddings
),
ebanded AS (
    SELECT id, b AS band,
           substr(esig, CAST(b * {_ER} + 1 AS INTEGER), {_ER}) AS bucket
    FROM ebase, UNNEST(range(0, {_EB})) AS t(b)
),
ecnt AS (SELECT band, bucket, count(*) AS cnt FROM ebanded GROUP BY 1, 2)
SELECT 'jaccard_max_df' AS guard, CAST(1000 AS INTEGER) AS threshold,
       CAST(count(CASE WHEN cnt > 1000 THEN 1 END) AS BIGINT) AS hot_keys,
       CAST(coalesce(sum(CASE WHEN cnt > 1000 THEN cnt END), 0) AS BIGINT)
         AS dropped_rows
FROM scnt
UNION ALL
SELECT 'minhash_max_bucket', CAST(100 AS INTEGER),
       CAST(count(CASE WHEN cnt > 100 THEN 1 END) AS BIGINT),
       CAST(coalesce(sum(CASE WHEN cnt > 100 THEN cnt END), 0) AS BIGINT)
FROM mcnt
UNION ALL
SELECT 'embed_max_bucket', CAST(200 AS INTEGER),
       CAST(count(CASE WHEN cnt > 200 THEN 1 END) AS BIGINT),
       CAST(coalesce(sum(CASE WHEN cnt > 200 THEN cnt END), 0) AS BIGINT)
FROM ecnt"""

    # ---- similarity ----
    o["ann_cosine_topk"] = f"""
SELECT b.vec_id,
       CAST(round({_dot_sql('b.embedding', 'a.embedding')}
            / ({_norm_sql('b.embedding')} * {_norm_sql('a.embedding')}), 6)
            AS DOUBLE) AS score
FROM embeddings b,
     (SELECT embedding FROM embeddings WHERE vec_id = 0) a
ORDER BY score DESC, vec_id LIMIT 10"""

    o["ann_lsh_buckets"] = f"""
SELECT vec_id, {_plane_bucket_sql('embedding')} AS lsh_bucket
FROM embeddings"""

    o["embedding_near_pairs"] = f"""
WITH base AS (
    SELECT vec_id AS id, embedding AS v, {_norm_sql('embedding')} AS nrm
    FROM embeddings
)
SELECT id_a, id_b, cosine FROM (
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(round({_dot_sql('a.v', 'b.v')} / (a.nrm * b.nrm), 6) AS DOUBLE) AS cosine
    FROM base a JOIN base b ON a.id < b.id
) WHERE cosine >= 0.35
ORDER BY id_a, id_b"""

    from engine.datawork.similarity import LSH_BANDS, LSH_ROWS
    # base is referenced by banded AND twice by the verify join — without
    # MATERIALIZED DuckDB inlines it and recomputes the plane-signature
    # expression per reference (A/B at sf0.01: 65 s → 33 s, identical rows)
    o["embedding_near_pairs_lsh"] = f"""
WITH base AS MATERIALIZED (  -- banded LSH: {LSH_BANDS} bands × {LSH_ROWS} planes, exact verify
    SELECT vec_id AS id, embedding AS v, {_norm_sql('embedding')} AS nrm,
           {_plane_bucket_sql('embedding', LSH_BANDS * LSH_ROWS)} AS sig
    FROM embeddings
),
banded AS (
    SELECT id, b AS band, substr(sig, CAST(b * {LSH_ROWS} + 1 AS INTEGER), {LSH_ROWS}) AS bucket
    FROM base, UNNEST(range(0, {LSH_BANDS})) AS t(b)
),
cand AS (
    SELECT DISTINCT ca.id AS id_a, cb.id AS id_b
    FROM banded ca JOIN banded cb
      ON ca.band = cb.band AND ca.bucket = cb.bucket AND ca.id < cb.id
)
SELECT id_a, id_b, cosine FROM (
    SELECT c.id_a, c.id_b,
           CAST(round({_dot_sql('x.v', 'y.v')} / (x.nrm * y.nrm), 6) AS DOUBLE) AS cosine
    FROM cand c JOIN base x ON x.id = c.id_a JOIN base y ON y.id = c.id_b
) WHERE cosine >= 0.35
ORDER BY id_a, id_b"""

    # incremental embedding near-dup: the SAME banded plan over old ∪ new
    # (the index layout is frozen at 24×4), restricted to wave-touching
    # pairs — the full-recompute side of the exactness contract
    # (engine/datawork/embed_incremental.py)
    def _in_ewave(c: str) -> str:
        return (f"(CAST(('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 8)) "
                f"AS BIGINT) % 10 >= 8)")
    o["embedding_incremental_pairs"] = f"""
WITH base AS MATERIALIZED (
    SELECT vec_id AS id, embedding AS v, {_norm_sql('embedding')} AS nrm,
           {_plane_bucket_sql('embedding', LSH_BANDS * LSH_ROWS)} AS sig
    FROM embeddings
),
banded AS (
    SELECT id, b AS band, substr(sig, CAST(b * {LSH_ROWS} + 1 AS INTEGER), {LSH_ROWS}) AS bucket
    FROM base, UNNEST(range(0, {LSH_BANDS})) AS t(b)
),
cand AS (
    SELECT DISTINCT ca.id AS id_a, cb.id AS id_b
    FROM banded ca JOIN banded cb
      ON ca.band = cb.band AND ca.bucket = cb.bucket AND ca.id < cb.id
),
ver AS (
    SELECT c.id_a, c.id_b,
           CAST(round({_dot_sql('x.v', 'y.v')} / (x.nrm * y.nrm), 6) AS DOUBLE) AS cosine
    FROM cand c JOIN base x ON x.id = c.id_a JOIN base y ON y.id = c.id_b
)
SELECT id_a, id_b, cosine,
       CASE WHEN {_in_ewave('id_a')} AND {_in_ewave('id_b')}
            THEN 'new_new' ELSE 'new_old' END AS origin
FROM ver
WHERE cosine >= 0.35
  AND ({_in_ewave('id_a')} OR {_in_ewave('id_b')})
ORDER BY id_a, id_b"""

    from engine.datawork.similarity import IVF_CELLS, IVF_NPROBE
    _ivf_common = f"""
WITH cent AS (  -- the n_cells SMALLEST-id vectors (id-range-agnostic)
    SELECT vec_id AS cell, embedding AS cv FROM embeddings
    ORDER BY vec_id LIMIT {IVF_CELLS}
),
scored AS (
    SELECT e.vec_id AS id, c.cell,
           CAST(round({_dot_sql('e.embedding', 'c.cv')}
                / ({_norm_sql('e.embedding')} * {_norm_sql('c.cv')}), 6)
                AS DOUBLE) AS ccos
    FROM embeddings e CROSS JOIN cent c
),
assign AS (
    SELECT id, cell FROM (
        SELECT id, cell,
               row_number() OVER (PARTITION BY id
                                  ORDER BY ccos DESC, cell) AS rk
        FROM scored
    ) WHERE rk = 1
)"""

    o["ann_ivf_assignments"] = _ivf_common + """
SELECT id AS vec_id, cell FROM assign"""

    o["ann_ivf_topk"] = _ivf_common + f""",
qprobe AS (
    SELECT cell FROM scored WHERE id = 0
    ORDER BY ccos DESC, cell LIMIT {IVF_NPROBE}
)
SELECT b.vec_id,
       CAST(round({_dot_sql('b.embedding', 'q.embedding')}
            / ({_norm_sql('b.embedding')} * {_norm_sql('q.embedding')}), 6)
            AS DOUBLE) AS score
FROM embeddings b
JOIN assign a ON b.vec_id = a.id
JOIN qprobe p ON a.cell = p.cell,
     (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY score DESC, vec_id LIMIT 10"""

    # ---- trained IVF codebook: the k-means iterations UNROLLED in SQL ----
    # Exactness rests on the engine's fixed-point centroid update: per-dim
    # sums are exact BIGINT arithmetic (floor(x·2^20 + 0.5)), so the
    # centroid values are partitioning-independent and both engines produce
    # bit-identical doubles; assignments round cosines to 6 with ties to
    # the smallest cell, same as the untrained rule.
    from engine.datawork.similarity import (IVF_CELLS as _KC,
                                            IVF_NPROBE as _KP,
                                            KMEANS_ITERS as _KI,
                                            KMEANS_SCALE as _KS)

    def _dot_d(a: str, b: str) -> str:  # operands already DOUBLE arrays
        return (f"list_sum(list_transform(range(1, 65), "
                f"i -> {a}[i] * {b}[i]))")

    _ksums = ", ".join(f"sum(fx[{d + 1}]) AS s{d}" for d in range(64))
    _kmean = ", ".join(f"s.s{d} / (s.cnt * {float(_KS)})" for d in range(64))
    _kmeans_blocks = []
    for i in range(1, _KI + 1):
        _kmeans_blocks.append(f"""
score{i} AS (
    SELECT p.id, p.fx, c.cell,
           CAST(round({_dot_d('p.v', 'c.cv')}
                / (p.nrm * sqrt({_dot_d('c.cv', 'c.cv')})), 6) AS DOUBLE)
               AS ccos
    FROM pn p CROSS JOIN cent{i - 1} c
),
assign{i} AS (
    SELECT id, cell, fx FROM (
        SELECT id, cell, fx,
               row_number() OVER (PARTITION BY id
                                  ORDER BY ccos DESC, cell) AS rk
        FROM score{i}
    ) WHERE rk = 1
),
sums{i} AS (
    SELECT cell, count(*) AS cnt, {_ksums}
    FROM assign{i} GROUP BY cell
),
cent{i} AS (
    SELECT c.cell,
           CASE WHEN s.cell IS NULL THEN c.cv ELSE [{_kmean}] END AS cv
    FROM cent{i - 1} c LEFT JOIN sums{i} s ON c.cell = s.cell
)""")
    _kmeans_common = f"""
WITH pts AS (
    SELECT vec_id AS id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
pn AS (
    SELECT id, v, sqrt({_dot_d('v', 'v')}) AS nrm,
           list_transform(v, x -> CAST(floor(x * {_KS} + 0.5) AS BIGINT))
               AS fx
    FROM pts
),
cent0 AS (
    SELECT CAST(rk - 1 AS INTEGER) AS cell, v AS cv FROM (
        SELECT id, v,
               row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id)
                   AS rk
        FROM pts
    ) WHERE rk <= {_KC}
),{",".join(_kmeans_blocks)},
final_score AS (
    SELECT p.id, c.cell,
           CAST(round({_dot_d('p.v', 'c.cv')}
                / (p.nrm * sqrt({_dot_d('c.cv', 'c.cv')})), 6) AS DOUBLE)
               AS ccos
    FROM pn p CROSS JOIN cent{_KI} c
),
final_assign AS (
    SELECT id, cell FROM (
        SELECT id, cell,
               row_number() OVER (PARTITION BY id
                                  ORDER BY ccos DESC, cell) AS rk
        FROM final_score
    ) WHERE rk = 1
)"""

    o["ann_ivf_trained"] = _kmeans_common + """
SELECT id AS vec_id, cell FROM final_assign ORDER BY vec_id"""

    o["ann_ivf_trained_topk"] = _kmeans_common + f""",
qprobe AS (
    SELECT c.cell FROM cent{_KI} c,
         (SELECT v AS qv, nrm AS qn FROM pn WHERE id = 0) q
    ORDER BY CAST(round({_dot_d('c.cv', 'q.qv')}
             / (sqrt({_dot_d('c.cv', 'c.cv')}) * q.qn), 6) AS DOUBLE) DESC,
             c.cell
    LIMIT {_KP}
)
SELECT b.id AS vec_id,
       CAST(round({_dot_d('b.v', 'q.qv')} / (b.nrm * q.qn), 6) AS DOUBLE)
           AS score
FROM pn b
JOIN final_assign a ON b.id = a.id
JOIN qprobe p ON a.cell = p.cell,
     (SELECT v AS qv, nrm AS qn FROM pn WHERE id = 0) q
ORDER BY score DESC, vec_id LIMIT 10"""

    _prof = " UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) AS n, "
        f"CAST(count(*) - count({c}) AS BIGINT) AS n_null, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM documents"
        for c in ["doc_id", "text", "lang", "source", "n_chars"])
    o["doc_profile"] = f'{_prof} ORDER BY "column"'

    # sliding-window chunking: 64-token windows, stride 48; integer
    # arithmetic only, so the window layout is engine-exact
    o["doc_chunks"] = """
WITH base AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
    FROM documents WHERE trim(coalesce(text, '')) <> ''
), dims AS (
    SELECT doc_id, w, len(w) AS n,
           CASE WHEN len(w) > 64
                THEN (len(w) - 64 + 47) // 48 ELSE 0 END AS ne
    FROM base
)
SELECT doc_id, CAST(t.k AS INTEGER) AS chunk_idx,
       array_to_string(list_slice(w, t.k*48 + 1, t.k*48 + 64), ' ') AS text,
       CAST(least(64, n - t.k*48) AS INTEGER) AS n_tokens
FROM dims, UNNEST(range(0, ne + 1)) AS t(k)
ORDER BY doc_id, chunk_idx"""

    # per-doc character entropy: H = ln(n) - sum(cnt*ln cnt)/n
    o["doc_char_entropy"] = """
WITH ch AS (
    SELECT doc_id AS id, t.c
    FROM (SELECT doc_id, string_split(text, '') AS cs FROM documents
          WHERE coalesce(text, '') <> '') x, UNNEST(cs) AS t(c)
), cnts AS (
    SELECT id, c, CAST(count(*) AS BIGINT) AS cnt FROM ch GROUP BY id, c
), ent AS (
    SELECT id, CAST(sum(cnt) AS BIGINT) AS n_chars,
           round(ln(sum(cnt)) - sum(cnt * ln(cnt)) / sum(cnt), 6)
               AS entropy
    FROM cnts GROUP BY id
)
SELECT doc_id, ent.n_chars, ent.entropy
FROM documents LEFT JOIN ent ON ent.id = documents.doc_id
ORDER BY doc_id"""

    # frozen hashed linear classifier: committed 6-decimal weights are
    # integerized to exact BIGINT micro-units so the per-doc sum is
    # partition-order-independent; margin is rounded before the sigmoid.
    from engine.datawork.quality import DEFAULT_QC_WEIGHTS
    _qcw = (f"read_csv('{DEFAULT_QC_WEIGHTS}', header=true, delim='\\t', "
            "columns={'bucket': 'INTEGER', 'weight': 'DOUBLE'})")
    o["corpus_classifier_scores"] = f"""
WITH tok AS (
    SELECT doc_id AS id, t.term
    FROM (SELECT doc_id, {_WORDS} AS ws FROM documents
          WHERE trim(coalesce(text, '')) <> '') w,
         UNNEST(ws) AS t(term)
), wt AS (
    SELECT bucket, CAST(round(weight * 1000000) AS BIGINT) AS w_u
    FROM {_qcw} WHERE bucket >= 0
), bias AS (
    SELECT CAST(round(weight * 1000000) AS BIGINT) AS b_u
    FROM {_qcw} WHERE bucket = -1
), scored AS (
    SELECT id, CAST(count(*) AS BIGINT) AS n_tokens,
           round((b_u * count(*) + sum(w_u))
                 / (count(*) * 1000000.0), 6) AS margin
    FROM tok
    JOIN wt ON wt.bucket =
        CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 1024, bias
    GROUP BY id, b_u
)
SELECT doc_id, scored.n_tokens, scored.margin,
       round(1.0 / (1.0 + exp(-scored.margin)), 6) AS score
FROM documents LEFT JOIN scored ON scored.id = documents.doc_id
ORDER BY doc_id"""

    # DSIR (Xie et al. 2023): hashed-bigram importance weights, target =
    # every 11th doc. rb is referenced three times (counts, totals,
    # scoring) → MATERIALIZED.
    _gb = "CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % 4096"
    _dsir_common = f"""
WITH tgt AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 11 = 0
), raw AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 0
), rtok AS (
    SELECT doc_id, {_WORDS} AS w
    FROM raw WHERE trim(coalesce(text, '')) <> ''
), ttok AS (
    SELECT doc_id, {_WORDS} AS w
    FROM tgt WHERE trim(coalesce(text, '')) <> ''
), rgrams AS (
    SELECT doc_id, t.gram FROM rtok, UNNEST(w) AS t(gram)
    UNION ALL
    SELECT bg.doc_id, t.gram
    FROM (SELECT doc_id, list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i + 1]) AS bl FROM rtok) bg,
         UNNEST(bl) AS t(gram)
), tgrams AS (
    SELECT t.gram FROM ttok, UNNEST(w) AS t(gram)
    UNION ALL
    SELECT t.gram
    FROM (SELECT list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i + 1]) AS bl FROM ttok) bg,
         UNNEST(bl) AS t(gram)
), rb AS MATERIALIZED (
    SELECT doc_id, {_gb} AS b FROM rgrams
), tb AS MATERIALIZED (
    SELECT {_gb} AS b FROM tgrams
), ct AS (
    SELECT b, CAST(count(*) AS BIGINT) AS ctv FROM tb GROUP BY b
), cr AS (
    SELECT b, CAST(count(*) AS BIGINT) AS crv FROM rb GROUP BY b
), tot AS (
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM tb) AS nt,
           (SELECT CAST(count(*) AS BIGINT) FROM rb) AS nr
), lam AS (
    SELECT coalesce(ct.b, cr.b) AS b,
           ln((coalesce(ctv, 0) + 1.0) / (nt + 4096))
         - ln((coalesce(crv, 0) + 1.0) / (nr + 4096)) AS llr
    FROM ct FULL OUTER JOIN cr ON ct.b = cr.b, tot
), scored AS (
    SELECT rb.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           round(sum(llr), 6) AS log_weight
    FROM rb JOIN lam USING (b) GROUP BY rb.doc_id
)"""

    o["corpus_dsir_weights"] = _dsir_common + """
SELECT raw.doc_id, scored.n_grams, scored.log_weight
FROM raw LEFT JOIN scored ON scored.doc_id = raw.doc_id
ORDER BY raw.doc_id"""

    o["corpus_dsir_select"] = _dsir_common + """
SELECT doc_id, n_grams, log_weight FROM scored
ORDER BY log_weight DESC, doc_id LIMIT 100"""

    # SemDeDup: rank each trained cluster by (cos-to-centroid ASC, id),
    # drop members with a lower-ranked mate at pairwise cosine ≥ τ. rked is
    # referenced twice (self-join) → MATERIALIZED so DuckDB doesn't re-run
    # the whole unrolled k-means per reference.
    o["semdedup_losers"] = _kmeans_common + f""",
rked AS MATERIALIZED (
    SELECT a.id, a.cell, p.v, p.nrm,
           row_number() OVER (PARTITION BY a.cell
                              ORDER BY s.ccos ASC, a.id) AS rk
    FROM final_assign a
    JOIN final_score s ON s.id = a.id AND s.cell = a.cell
    JOIN pn p ON p.id = a.id
),
prs AS (
    SELECT b.id AS vec_id, b.cell AS cell, a.id AS kept_id, a.rk AS krk,
           CAST(round({_dot_d('a.v', 'b.v')} / (a.nrm * b.nrm), 6)
               AS DOUBLE) AS cosine
    FROM rked a JOIN rked b ON a.cell = b.cell AND a.rk < b.rk
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cell AS INTEGER) AS cell,
       CAST(kept_id AS BIGINT) AS kept_id, cosine
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY krk) AS prk
      FROM prs WHERE cosine >= 0.35)
WHERE prk = 1 ORDER BY vec_id"""

    # the wave probe is the SAME full-recompute chain (identical frozen
    # codebook) restricted to wave ids — a targeted rewrite of the final
    # filter keeps the two oracles in lockstep by construction
    def _in_vwave(c: str) -> str:
        return (f"(CAST(('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 8)) "
                f"AS BIGINT) % 10 >= 8)")
    o["semdedup_wave_losers"] = o["semdedup_losers"].replace(
        "WHERE prk = 1 ORDER BY vec_id",
        f"WHERE prk = 1\n  AND {_in_vwave('vec_id')}\nORDER BY vec_id")

    # retroactive losers = (losers(old ∪ new) − losers(old)) ∩ corpus:
    # same chain, final filter = corpus side minus docs that already had
    # an old (corpus×corpus) shadower — the probe's losers/ exclusion set
    _old_shadowed = f"""
      SELECT b.id FROM rked a JOIN rked b
        ON a.cell = b.cell AND a.rk < b.rk
      WHERE NOT {_in_vwave('a.id')} AND NOT {_in_vwave('b.id')}
        AND CAST(round({_dot_d('a.v', 'b.v')} / (a.nrm * b.nrm), 6)
                 AS DOUBLE) >= 0.35"""
    o["semdedup_retroactive_losers"] = o["semdedup_losers"].replace(
        "WHERE prk = 1 ORDER BY vec_id",
        f"WHERE prk = 1\n  AND NOT {_in_vwave('vec_id')}\n"
        f"  AND vec_id NOT IN ({_old_shadowed})\nORDER BY vec_id")

    # multi-probe top-k: candidates = vectors whose 8-plane bucket is within
    # Hamming 1 of the query's bucket (probe_bits=1); data-independent SQL —
    # the query bucket is computed in the same statement.
    _ham = " + ".join(
        f"(CASE WHEN substr(bkt, {i}, 1) = substr(qb, {i}, 1) THEN 0 ELSE 1 END)"
        for i in range(1, 9))
    o["ann_lsh_topk_probe"] = f"""
WITH q AS (
    SELECT embedding AS qv, {_plane_bucket_sql('embedding')} AS qb
    FROM embeddings WHERE vec_id = 0
),
scored AS (
    SELECT b.vec_id, {_plane_bucket_sql('b.embedding')} AS bkt, q.qb,
           CAST(round({_dot_sql('b.embedding', 'q.qv')}
                / ({_norm_sql('b.embedding')} * {_norm_sql('q.qv')}), 6)
                AS DOUBLE) AS score
    FROM embeddings b, q
)
SELECT vec_id, score FROM scored
WHERE {_ham} <= 1
ORDER BY score DESC, vec_id LIMIT 10"""

    # persisted-index probe: by construction identical to the in-memory
    # multi-probe path (the index is bucketed with the same frozen planes),
    # so it shares that oracle — the driver gate doubles as the
    # equivalence proof, the conversation_documents_salted pattern.
    o["ann_index_probe"] = o["ann_lsh_topk_probe"]

    o["ann_index_probe_batch"] = f"""
WITH b AS (
    SELECT vec_id, embedding, {_plane_bucket_sql('embedding')} AS bkt
    FROM embeddings
), q AS (
    SELECT vec_id AS qid, embedding AS qv, bkt AS qb
    FROM b WHERE vec_id % 17 = 0
), scored AS (
    SELECT q.qid, b.vec_id AS id,
           CAST(round({_dot_sql('b.embedding', 'q.qv')}
                / ({_norm_sql('b.embedding')} * {_norm_sql('q.qv')}), 6)
                AS DOUBLE) AS score
    FROM b JOIN q ON b.bkt = q.qb AND b.vec_id != q.qid
), rk AS (
    SELECT qid, id, score,
           CAST(row_number() OVER (PARTITION BY qid
                                   ORDER BY score DESC, id) AS INT) AS rank
    FROM scored
)
SELECT qid, id, score, rank FROM rk WHERE rank <= 3"""

    o["pdf_payload_extract"] = """
SELECT doc_id,
       md5(trim(text)) AS cleaned_md5,
       CAST(len(regexp_extract_all(trim(text), '\\w+')) AS INTEGER) AS word_count,
       CAST(CASE WHEN length(trim(text)) >= 20
                  AND NOT starts_with(trim(text), '#')
             THEN 1 ELSE 0 END AS INTEGER) AS passages_count,
       NULL AS error
FROM documents"""

    # multimodal_features: the decode is stubbed (no codecs in container),
    # but everything the query emits IS deterministic — byte count, content
    # md5, and the hex-chained fake features — so it gets a real oracle.
    _terms = []
    for _j in range(4):  # FEATURE_DIM=16 → 4 values per digest × 4 digests
        _terms += [f"CAST(('0x' || substr(h{_j}, {i * 8 + 1}, 8)) AS BIGINT)"
                   f" / 4294967296.0" for i in range(4)]
    o["multimodal_features"] = f"""
WITH h AS (
    SELECT doc_id, md5(text) AS h0 FROM documents
), hh AS (
    SELECT doc_id, h0, md5(h0) AS h1, md5(md5(h0)) AS h2,
           md5(md5(md5(h0))) AS h3
    FROM h
)
SELECT 'asset-' || CAST(d.doc_id AS VARCHAR) AS asset_id,
       'image' AS kind,
       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
       hh.h0 AS content_hash,
       CAST(round({" + ".join(_terms)}, 6) AS DOUBLE) AS feature_sum,
       CAST(NULL AS VARCHAR) AS error
FROM documents d JOIN hh ON d.doc_id = hh.doc_id"""

    # pipeline_lineage: intentionally no oracle (wall-clock fields) →
    # driver rows-only check.
    return o
