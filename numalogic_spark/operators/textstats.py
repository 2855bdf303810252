"""Text analysis for training-data pipelines: quality stats, token counting,
language-ID heuristic, document fingerprinting.

All stat/metric columns are JVM-side expressions (split / regexp /
higher-order array functions) — no Python in the scan path. Language ID is
a stopword-hit heuristic (n-gram-free but same spirit as public langid
approaches); fingerprint is a polynomial rolling hash over the word stream
in modular arithmetic sized to avoid ANSI long overflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# "BPE-ish" tokenizer regex: word pieces, numbers, single punctuation marks
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# minimal stopword inventories for the language-ID heuristic
_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is", "in", "that", "it", "for"],
    "de": ["der", "die", "und", "ist", "das", "ein", "zu", "nicht", "mit", "sich"],
    "fr": ["le", "la", "et", "est", "un", "une", "des", "que", "pour", "dans"],
    "es": ["el", "la", "y", "es", "un", "una", "que", "de", "por", "con"],
    "it": ["il", "la", "e", "è", "un", "una", "che", "di", "per", "non"],
    "pt": ["o", "a", "e", "é", "um", "uma", "que", "de", "para", "com"],
    "nl": ["de", "het", "een", "en", "is", "van", "dat", "niet", "met", "voor"],
    "sv": ["och", "att", "det", "som", "en", "är", "på", "för", "med", "inte"],
    "pl": ["i", "w", "na", "z", "że", "się", "nie", "jest", "do", "to"],
    "tr": ["ve", "bir", "bu", "için", "ile", "da", "ne", "gibi", "çok", "ama"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "ke"],
    "fi": ["ja", "on", "ei", "se", "että", "oli", "hän", "mutta", "kun", "niin"],
}


def words_expr(text_col: str) -> Column:
    # drop empty tokens from leading/trailing whitespace
    return F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality metrics: char/word/token counts, type-token ratio,
    mean word length, punctuation & whitespace ratios, quality score."""
    words = words_expr(text_col)
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    n_tokens = F.size(F.regexp_extract_all(F.lower(t), F.lit(TOKEN_RE), F.lit(0)))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_space = n_chars - F.length(F.regexp_replace(t, r"\s", ""))
    # zero-word guard: Spark 4's default ANSI mode ABORTS on division by
    # zero while DuckDB yields NULL — NULL-out both ratios explicitly so
    # an empty/whitespace-only doc produces a row (not a job failure) and
    # the quality least() skips the NULL term, matching the oracle
    ttr = F.when(n_words > 0, n_distinct / n_words)
    mean_word_len = F.when(n_words > 0, (n_chars - n_space) / n_words)
    # quality score: bounded composite (longer docs with diverse vocab and
    # sane punctuation score higher) — a standard heuristic shape
    quality = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(ttr, F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(n_punct / F.greatest(n_chars, F.lit(1)), F.lit(1.0))) * F.lit(0.2)
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        ttr.alias("ttr"),
        mean_word_len.alias("mean_word_len"),
        quality.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID: argmax over per-language hit counts of the
    doc's distinct words; 'und' (undetermined) when no stopword matches.
    Pure array_intersect — one narrow stage."""
    words = F.array_distinct(words_expr(text_col))
    hits = {
        lang: F.size(F.array_intersect(words, F.lit(sw).cast("array<string>")))
        for lang, sw in _STOPWORDS.items()
    }
    best_count = F.greatest(*hits.values())
    pred = F.lit("und")
    for lang in reversed(list(_STOPWORDS)):  # earlier langs win ties
        pred = F.when(hits[lang] == best_count, F.lit(lang)).otherwise(pred)
    pred = F.when(best_count == 0, F.lit("und")).otherwise(pred)
    cols = [F.col(id_col), pred.alias("lang_pred")]
    cols += [hits[lang].alias(f"hits_{lang}") for lang in _STOPWORDS]
    return df.select(*cols)


# --------------------------------------------------------------------------
# character-n-gram language ID (Cavnar-Trenkle-style profiles)
# --------------------------------------------------------------------------

# seed text per language: a few sentences dominated by function words —
# the signal char-ngram language ID actually keys on. Profiles are the
# top trigram codes of these seeds, computed at import time (pure python,
# deterministic), then shipped as literal arrays.
_SEED_TEXT = {
    "en": "the quick brown fox jumps over the lazy dog and then it runs away "
          "because there was nothing else for it to do in that place with the "
          "other animals that were watching it from the edge of the forest "
          "and it was not the first time that this had happened to them there",
    "de": "der schnelle braune fuchs springt über den faulen hund und dann "
          "läuft er weg weil es für ihn nichts anderes zu tun gab an diesem "
          "ort mit den anderen tieren die ihn vom rand des waldes beobachteten "
          "es war nicht das erste mal dass ihnen dort so etwas passiert war "
          "und sie wussten auch dass es nicht das letzte mal sein würde",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et puis "
          "il s'enfuit parce qu'il n'y avait rien d'autre à faire pour lui à "
          "cet endroit avec les autres animaux qui le regardaient depuis la "
          "lisière ce n'était pas la première fois que cela leur arrivait là "
          "et ils savaient aussi que ce ne serait pas la dernière fois",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y luego se "
          "escapa porque no había nada más que hacer para él en ese lugar con "
          "los otros animales que lo miraban desde el borde del bosque no era "
          "la primera vez que eso les pasaba allí y también sabían que no "
          "sería la última vez",
    "it": "la rapida volpe marrone salta sopra il cane pigro e poi scappa via "
          "perché non c'era nient'altro da fare per lei in quel posto con gli "
          "altri animali che la guardavano dal bordo del bosco non era la "
          "prima volta che questo accadeva loro e sapevano anche che non "
          "sarebbe stata l'ultima volta",
    "pt": "a rápida raposa marrom salta sobre o cão preguiçoso e depois foge "
          "porque não havia mais nada para fazer naquele lugar com os outros "
          "animais que a observavam da beira da floresta não era a primeira "
          "vez que isso lhes acontecia ali e também sabiam que não seria a "
          "última vez",
    "nl": "de snelle bruine vos springt over de luie hond en dan rent hij weg "
          "omdat er niets anders voor hem te doen was op die plek met de "
          "andere dieren die hem vanaf de rand van het bos bekeken het was "
          "niet de eerste keer dat hun dat daar overkwam en ze wisten ook dat "
          "het niet de laatste keer zou zijn",
    "sv": "den snabba bruna räven hoppar över den lata hunden och sedan "
          "springer den iväg eftersom det inte fanns något annat för den att "
          "göra på den platsen med de andra djuren som tittade på den från "
          "skogens kant det var inte första gången som detta hände dem där "
          "och de visste också att det inte skulle bli sista gången",
    "pl": "szybki brązowy lis skacze nad leniwym psem a potem ucieka ponieważ "
          "nie było tam nic innego do zrobienia dla niego w tym miejscu z "
          "innymi zwierzętami które patrzyły na niego ze skraju lasu to nie "
          "był pierwszy raz kiedy im się to tam zdarzyło i wiedzieli też że "
          "to nie będzie ostatni raz",
    "tr": "hızlı kahverengi tilki tembel köpeğin üzerinden atlar ve sonra "
          "kaçar çünkü orada onun için yapacak başka bir şey yoktu o yerde "
          "ormanın kenarından onu izleyen diğer hayvanlarla birlikte bu "
          "onların başına orada ilk kez gelmiyordu ve bunun son olmayacağını "
          "da biliyorlardı",
    "id": "rubah coklat yang cepat melompati anjing yang malas dan kemudian "
          "lari karena tidak ada hal lain yang bisa dilakukannya di tempat "
          "itu bersama hewan hewan lain yang memperhatikannya dari tepi hutan "
          "itu bukan pertama kalinya hal itu terjadi pada mereka di sana dan "
          "mereka juga tahu bahwa itu bukan yang terakhir",
    "fi": "nopea ruskea kettu hyppää laiskan koiran yli ja sitten se juoksee "
          "pois koska sillä ei ollut siellä muuta tekemistä siinä paikassa "
          "muiden eläinten kanssa jotka katselivat sitä metsän reunalta se ei "
          "ollut ensimmäinen kerta kun näin tapahtui heille siellä ja he "
          "tiesivät myös ettei se olisi viimeinen kerta",
}
_PROFILE_SIZE = 150


def _trigram_codes_py(text: str) -> list[int]:
    """Python twin of dedup.char_shingle_codes (multiplicity kept)."""
    from numalogic_spark.operators.dedup import SHINGLE_BASE

    t = text.lower()
    out = []
    for i in range(max(len(t) - 2, 1)):
        c = 0
        for j in range(3):
            c = c * SHINGLE_BASE + (ord(t[i + j]) if i + j < len(t) else 0)
        out.append(c)
    return out


def _lang_profiles() -> dict[str, list[int]]:
    from collections import Counter

    return {
        lang: [c for c, _ in Counter(_trigram_codes_py(seed)).most_common(_PROFILE_SIZE)]
        for lang, seed in _SEED_TEXT.items()
    }


def lang_id_ngram(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Char-trigram language ID: score(lang) = fraction of the doc's
    trigram OCCURRENCES that appear in the language's profile (top trigrams
    of a seed corpus — Cavnar-Trenkle's profile idea with a containment
    score instead of rank distance, which keeps it one JVM array pass per
    language). argmax over languages; 'und' when nothing matches.

    The trigram encoding is the shared portable shingle code
    (dedup.char_shingle_codes, multiplicity kept), so the DuckDB oracle
    replays scoring exactly."""
    from numalogic_spark.functions.exprs import let_bind
    from numalogic_spark.operators.dedup import char_shingle_codes

    profiles = _lang_profiles()

    def scored(sh: Column) -> Column:
        n = F.greatest(F.size(sh), F.lit(1))
        fields = []
        for lang, prof in profiles.items():
            hits = F.size(F.filter(sh, lambda s: F.array_contains(F.lit(prof), s)))
            fields.append((hits / n).alias(f"score_{lang}"))
        return F.struct(*fields)

    out = df.select(
        F.col(id_col),
        let_bind(char_shingle_codes(F.col(text_col), 3, distinct=False), scored).alias("_s"),
    )
    langs = list(profiles)
    best = F.greatest(*[F.col(f"_s.score_{la}") for la in langs])
    pred = F.lit("und")
    for la in reversed(langs):  # earlier langs win ties
        pred = F.when(F.col(f"_s.score_{la}") == best, F.lit(la)).otherwise(pred)
    pred = F.when(best <= F.lit(0.0), F.lit("und")).otherwise(pred)
    return out.select(
        id_col,
        pred.alias("lang_pred"),
        *[F.col(f"_s.score_{la}").alias(f"score_{la}") for la in langs],
    )


def _run_lengths(sorted_arr: Column) -> Column:
    """Run lengths of equal adjacent values in a SORTED array — the
    multiset of per-value counts in O(n), replacing the
    O(distinct·n) transform-over-distinct counting that blows up on long
    documents. Empty input → empty output."""
    from numalogic_spark.functions.exprs import let_bind

    def f(sh: Column) -> Column:
        n = F.size(sh)
        starts = F.filter(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: (i == 1)
            | ~F.try_element_at(sh, i.cast("int")).eqNullSafe(
                F.try_element_at(sh, F.greatest(i - 1, F.lit(1)).cast("int"))
            ),
        )
        def runs(st: Column) -> Column:
            nxt = F.concat(
                F.slice(st, 2, F.greatest(F.size(st) - 1, F.lit(0))),
                F.array((n + 1).cast("int")),
            )
            return F.zip_with(st, nxt, lambda a, b: b - a)

        return F.when(n > 0, let_bind(starts, runs)).otherwise(
            F.array().cast("array<int>")
        )

    return let_bind(sorted_arr, f)


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher/MassiveText-style repetition quality signals, pure JVM:

    - ``dup_trigram_frac``: 1 − distinct/total word trigrams (0 when < 3
      words) — boilerplate and looping text score high;
    - ``dup_line_frac``: 1 − distinct/total newline-split lines;
    - ``top_word_frac``: occurrences of the most frequent word / total
      words (degenerate keyword-stuffed docs approach 1).

    The trigram identity is the shared portable word-n-gram hash
    (dedup.word_ngram_hashes), so the DuckDB oracle replays every count."""
    from numalogic_spark.functions.exprs import let_bind
    from numalogic_spark.operators.dedup import word_ngram_hashes

    words = words_expr(text_col)
    tri = word_ngram_hashes(F.col(text_col), 3)
    dup_tri = let_bind(
        tri,
        lambda g: F.when(
            F.size(g) > 0,
            1.0 - F.size(F.array_distinct(g)) / F.size(g),
        ).otherwise(F.lit(0.0)),
    )
    lines = F.array_remove(F.split(F.col(text_col), r"\n"), "")
    dup_line = let_bind(
        lines,
        lambda ln: F.when(
            F.size(ln) > 0, 1.0 - F.size(F.array_distinct(ln)) / F.size(ln)
        ).otherwise(F.lit(0.0)),
    )
    # max run length of the SORTED word array: O(n log n), not the
    # O(distinct·n) count-by-filter that blows up on long documents
    top_word = let_bind(
        words,
        lambda ws: F.when(
            F.size(ws) > 0,
            F.array_max(_run_lengths(F.array_sort(ws))) / F.size(ws),
        ).otherwise(F.lit(0.0)),
    )
    return df.select(
        F.col(id_col),
        dup_tri.alias("dup_trigram_frac"),
        dup_line.alias("dup_line_frac"),
        top_word.alias("top_word_frac"),
    )


def trigram_entropy(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Shannon entropy (nats) of the char-trigram distribution per doc — a
    perplexity proxy: degenerate/looping text scores low, diverse natural
    text high. Zero for docs shorter than one trigram.

    H = ln(n) − (Σ c·ln c)/n over trigram multiplicities c (the numerically
    stable regrouping — no per-trigram division). Uses the same portable
    trigram codes as the dedup family (char_shingle_codes with
    multiplicity kept), so the oracle replays the counts."""
    from numalogic_spark.functions.exprs import let_bind
    from numalogic_spark.operators.dedup import char_shingle_codes

    def entropy(sh: Column) -> Column:
        # counts via sorted run lengths (O(n log n), not O(distinct·n));
        # the Σ c·ln c fold runs over SORTED counts so the float addition
        # order is deterministic and engine-independent — the DuckDB
        # oracle sorts its counts identically before summing
        n = F.size(sh)
        counts = F.array_sort(_run_lengths(F.array_sort(sh)))
        s = F.aggregate(
            counts,
            F.lit(0.0),
            lambda acc, c: acc + c.cast("double") * F.log(c.cast("double")),
        )
        return F.when(n > 0, F.log(n.cast("double")) - s / n).otherwise(F.lit(0.0))

    return df.select(
        F.col(id_col),
        let_bind(char_shingle_codes(F.col(text_col), 3, distinct=False), entropy).alias(
            "trigram_entropy"
        ),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling polynomial hash over the word stream:
    fp = Σ h(w_i)·B^(n-1-i) mod M, computed as a left fold
    fp_i = (fp_{i-1}·B + h(w_i)) mod M with M=2^31-1, B=1000003 (products
    stay < 2^63 → safe under ANSI arithmetic). h is the portable character
    fold shared with the dedup hash family, so the driver's DuckDB oracle
    recomputes fingerprints exactly. Same-words-different-order docs get
    different fingerprints, unlike the word-set hash."""
    from numalogic_spark.operators.dedup import _CHAR_MULT_1, _word_char_fold

    M, B = 2147483647, 1000003
    words = words_expr(text_col)
    fp = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * B + _word_char_fold(w, _CHAR_MULT_1)) % M,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


# ---------------------------------------------------------------------------
# PII scrubbing (the C4-style cleanup step) — conservative patterns chosen
# to behave identically in Java regex (Spark) and RE2 (DuckDB oracle):
# character classes + bounded quantifiers only, no lookaround/backrefs.
# ---------------------------------------------------------------------------

PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement) — applied IN ORDER: email before ipv4
    # (an address inside user@1.2.3.4 is part of the email), ipv4 before
    # phone (a dotted quad would otherwise read as a dotted phone number).
    # The phone pattern requires PHONE-SHAPED grouping: either a bare
    # digit run of 10+ (uncapped so 15+-digit card/account numbers redact
    # WHOLE, no trailing residue), or 1-2 short (2-3 digit) groups between
    # a 1-4 digit lead and a 4-digit tail, each separated by EXACTLY ONE
    # of [-. ].
    # An earlier [0-9()\-. ]{7,} class allowed unlimited interior spaces
    # and redacted any >=9-char run of numbers ("100 200 300", year
    # lists, score tables) to <PHONE>, silently mangling number-heavy
    # text. 4-digit interior groups are deliberately excluded — they are
    # what makes year lists ("2019 2020 2021") phone-shaped.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    (
        "phone",
        # bare branch is {10,} not {10,14}: a cap would leave the tail of a
        # 15+-digit identifier (card/account numbers) unredacted
        r"\+?[0-9]{10,}"
        r"|\+?\(?[0-9]{1,4}\)?(?:[-. ]\(?[0-9]{2,3}\)?){1,2}[-. ]?[0-9]{4}",
        "<PHONE>",
    ),
]


def scrub_pii_expr(text_col: str) -> Column:
    """The chained redaction as ONE column expression — the row-local form
    for in-place rewrites (no join, no shuffle; NULL text stays NULL)."""
    scrubbed = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return scrubbed


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / phone numbers / IPv4 addresses with typed
    placeholders and count the redactions per category: (id, scrubbed,
    n_email, n_ipv4, n_phone). Patterns apply in PII_PATTERNS order (see
    its comment for why email < ipv4 < phone). Pure JVM regexp
    expressions — one projection, no shuffle, no Python."""
    scrubbed = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


# ---------------------------------------------------------------------------
# corpus-wide boilerplate-line removal (the repeated-line dedup of
# C4/CCNet: navigation chrome, cookie banners, footers recur across docs)
# ---------------------------------------------------------------------------


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
    min_line_chars: int = 5,
    broadcast_boiler: bool = False,
) -> DataFrame:
    """Drop every line that occurs in ≥ ``min_docs`` DISTINCT documents
    (after trimming; lines shorter than ``min_line_chars`` are exempt —
    short lines repeat by chance). Returns (id, n_lines, n_kept, cleaned)
    with ``cleaned`` = surviving lines rejoined in order. NULL-text docs
    produce no output row (they have no lines) — rewrite callers should
    LEFT-join (config's BoilerplateFilter does).

    Scale shape: explode(lines) → two-level distinct-doc count (the same
    never-shuffle-a-wide-distinct discipline as token_frequencies) →
    the boilerplate set joins back against the exploded lines, and docs
    reassemble with an order-safe sort by line position. No Python
    anywhere. The join is left to Spark's planner by default — on clean
    corpora the set IS tiny (chrome lines: few but frequent) and
    auto-broadcasts, but on duplicate-heavy raw crawls run BEFORE exact
    dedup it can scale with total distinct lines, so the forced-broadcast
    hint is opt-in (``broadcast_boiler=True``), not assumed."""
    lines = F.split(F.col(text_col), "\n")
    exploded = df.select(
        F.col(id_col).alias("id"), F.posexplode(lines).alias("pos", "line")
    ).withColumn("tline", F.trim(F.col("line")))
    # distinct (doc, line) first — map-side combine collapses within-doc
    # repeats before the count shuffle
    boiler = (
        exploded.filter(F.length("tline") >= min_line_chars)
        .select("id", "tline")
        .distinct()
        .groupBy("tline")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("tline")
    )
    bset = boiler.withColumn("_boiler", F.lit(True))
    if broadcast_boiler:
        bset = F.broadcast(bset)
    marked = exploded.join(bset, "tline", "left")
    return (
        marked.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("_boiler").isNull(), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_boiler").isNull(), F.struct("pos", "line"))
                )
            ).alias("_kept"),
        )
        .select(
            F.col("id"),
            F.col("n_lines"),
            F.col("n_kept"),
            F.array_join(F.col("_kept.line"), "\n").alias("cleaned"),
        )
    )


# normalization patterns (applied in order): RE2 ≡ Java on hex escapes,
# char classes and bounded quantifiers
NORMALIZE_STEPS: list[tuple[str, str]] = [
    (r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""),  # strip control chars (keep \t \n)
    (r"[ \t]+", " "),                             # collapse spaces/tabs
    (r" ?\n ?", "\n"),                            # trim around newlines
    (r"\n{3,}", "\n\n"),                          # squeeze blank-line runs
]


def normalize_text_expr(text_col: str) -> Column:
    """CCNet-style text normalization as ONE chained expression: control
    characters stripped, horizontal whitespace collapsed, line structure
    preserved (so BoilerplateFilter still sees lines), ≥3 blank lines
    squeezed to one, ends trimmed. NULL passes through."""
    out = F.col(text_col)
    for pat, repl in NORMALIZE_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)
