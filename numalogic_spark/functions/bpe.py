"""Byte-level BPE subword tokenizer — train + vectorized encode on Spark.

Training-data-pipeline capability (not in the reference — numalogic's
domain is metric streams, see reference/numalogic/tools/types.py; its
"tokens" are pre-tokenized int sequences). A real corpus-prep pipeline
needs the tokenize step itself, so this module implements the standard
byte-pair-encoding algorithm (Sennrich et al. 2016; byte-level base
alphabet as in GPT-2) structured for Spark scale:

- **Training** splits into the part that must see all the data and the
  part that must be sequential. The corpus-wide WORD FREQUENCY table is
  computed distributedly (explode → groupBy word → sum — map-side combine
  collapses repeats before the shuffle, and the result is Zipf-bounded so
  a `max_words` top-K cap loses almost no mass). Only that bounded
  word→count dict is collected; the inherently sequential merge loop runs
  driver-side over it with an incremental pair-count heap — the same
  architecture as subword-nmt/fastBPE, where training never streams the
  corpus twice.
- **Encoding** is embarrassingly parallel: the learned merge-rank table
  ships once per executor inside a serialized Arrow-batched kernel
  (mapInPandas — same "matrix in the closure" pattern as
  operators/similarity.py), and a per-batch word→ids cache makes the
  amortized cost per token tiny (Zipf again: a few thousand distinct
  words cover almost all tokens of a batch).

No per-row Python UDFs: the encode kernel is Arrow-batched; everything
else is DataFrame expressions.
"""

from __future__ import annotations

import heapq
import json
import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2-ish pre-tokenization: contractions, letter runs, digit runs,
# other-symbol runs, each capturing one optional leading space — keeps
# merges from crossing word boundaries while preserving the exact text.
_PRETOKEN_RE = re.compile(
    # NB: the symbol-run class must be "not whitespace, not letter, not
    # digit" — [^\s\w] alone would drop '_' (it is \w but neither letter
    # nor digit), breaking the lossless-roundtrip property.
    r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+",
    re.UNICODE,
)

_BASE_VOCAB = 256  # byte-level base alphabet: every UTF-8 byte is a token


def pretokenize(text: str) -> list[str]:
    """Split text into BPE pre-tokens (words with their leading space)."""
    return _PRETOKEN_RE.findall(text)


@dataclass
class BpeVocab:
    """Learned BPE model: ordered merge list over byte-level token ids.

    Token id space: 0..255 = raw bytes; 256+i = result of merge i.
    `ranks` maps a pair to the id its merge produces (= 256 + its rank);
    lower produced id == earlier merge == higher priority.
    """

    merges: list[tuple[int, int]] = field(default_factory=list)

    @property
    def ranks(self) -> dict[tuple[int, int], int]:
        return {pair: _BASE_VOCAB + i for i, pair in enumerate(self.merges)}

    @property
    def vocab_size(self) -> int:
        return _BASE_VOCAB + len(self.merges)

    def token_bytes(self) -> list[bytes]:
        """id → byte string (for decode / inspection)."""
        toks = [bytes([i]) for i in range(_BASE_VOCAB)]
        for a, b in self.merges:
            toks.append(toks[a] + toks[b])
        return toks

    # -- persistence (the artifact-registry analog for the tokenizer:
    #    a replayable JSON artifact, like plans/manifest.py's metadata) --
    def dumps(self) -> str:
        return json.dumps({"version": 1, "merges": [list(m) for m in self.merges]})

    @classmethod
    def loads(cls, s: str) -> "BpeVocab":
        obj = json.loads(s)
        return cls(merges=[tuple(m) for m in obj["merges"]])

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.dumps())

    @classmethod
    def load(cls, path: str) -> "BpeVocab":
        with open(path) as f:
            return cls.loads(f.read())

    @classmethod
    def load_resource(cls, name: str = "bpe_frozen_150.json") -> "BpeVocab":
        """Load a frozen vocab shipped inside the package via
        importlib.resources — works both from a checkout and from a
        --py-files zip, where a __file__-relative path would point inside
        the archive and builtin open() would fail."""
        from importlib import resources

        data = (
            resources.files("numalogic_spark.resources")
            .joinpath(name)
            .read_text(encoding="utf-8")
        )
        return cls.loads(data)

    def save_hadoop(self, spark, path: str) -> None:
        """Save through the Hadoop FileSystem API so s3a/hdfs/file URIs all
        work (builtin open() only handles local paths — a cluster prep job
        writing to s3a would otherwise crash AFTER training completed)."""
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        out = fs.create(p, True)
        try:
            out.write(bytearray(self.dumps().encode("utf-8")))
        finally:
            out.close()

    @classmethod
    def load_hadoop(cls, spark, path: str) -> "BpeVocab":
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        stream = fs.open(p)
        try:
            reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(stream, "UTF-8"))
            chunks = []
            line = reader.readLine()
            while line is not None:
                chunks.append(line)
                line = reader.readLine()
            return cls.loads("\n".join(chunks))
        finally:
            stream.close()


def encode_word(word_bytes: bytes, ranks: dict[tuple[int, int], int]) -> list[int]:
    """Reference-path encode of ONE pre-token: repeatedly merge the
    best-ranked (lowest produced id) adjacent pair, leftmost-first on
    ties within a step. O(n²) worst case but words are short; the Arrow
    kernel calls this once per DISTINCT word per batch (cache)."""
    ids = list(word_bytes)
    while len(ids) > 1:
        best = None
        best_rank = None
        for i in range(len(ids) - 1):
            r = ranks.get((ids[i], ids[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # merge ALL occurrences of the chosen pair, left to right
        pair = (ids[best], ids[best + 1])
        out: list[int] = []
        i = 0
        while i < len(ids):
            if i < len(ids) - 1 and (ids[i], ids[i + 1]) == pair:
                out.append(best_rank)
                i += 2
            else:
                out.append(ids[i])
                i += 1
        ids = out
    return ids


def encode_text(text: str, vocab: BpeVocab) -> list[int]:
    """Driver-side/reference encode of a full text (tests, small inputs)."""
    ranks = vocab.ranks
    out: list[int] = []
    cache: dict[str, list[int]] = {}
    for w in pretokenize(text):
        ids = cache.get(w)
        if ids is None:
            ids = encode_word(w.encode("utf-8"), ranks)
            cache[w] = ids
        out.extend(ids)
    return out


def decode_ids(ids: list[int], vocab: BpeVocab) -> str:
    toks = vocab.token_bytes()
    return b"".join(toks[i] for i in ids).decode("utf-8", errors="replace")


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def train_bpe_from_word_counts(
    word_counts: dict[str, int], n_merges: int
) -> BpeVocab:
    """Sequential merge learning over a word→count dict (the bounded part).

    Incremental pair-count maintenance with a lazy-deletion heap: each
    merge updates only the words containing the merged pair (inverted
    index), so training is O(total pair updates · log P), not
    O(n_merges · corpus). Ties break on the smaller pair (deterministic
    across runs — required for the replayable-artifact story)."""
    words: list[list[int]] = []
    counts: list[int] = []
    for w, c in sorted(word_counts.items()):
        if c <= 0:
            continue
        words.append(list(w.encode("utf-8")))
        counts.append(int(c))

    pair_counts: dict[tuple[int, int], int] = {}
    pair_words: dict[tuple[int, int], set[int]] = {}
    for wi, ids in enumerate(words):
        c = counts[wi]
        for a, b in zip(ids, ids[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(wi)

    # max-heap by count, tie → lexicographically smallest pair
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[int, int]] = []
    while len(merges) < n_merges and heap:
        neg, pair = heapq.heappop(heap)
        cur = pair_counts.get(pair, 0)
        if cur <= 0:
            continue
        if -neg != cur:  # stale heap entry — reinsert with live count
            heapq.heappush(heap, (-cur, pair))
            continue
        new_id = _BASE_VOCAB + len(merges)
        merges.append(pair)
        touched: set[tuple[int, int]] = set()
        for wi in pair_words.pop(pair, ()):  # only words containing the pair
            ids = words[wi]
            c = counts[wi]
            # subtract this word's old pair contributions wholesale, rebuild
            # the word, re-add — O(|word|) and immune to the classic
            # overlapping-occurrence bookkeeping bugs ("aaaa" → (new,new)).
            for q in zip(ids, ids[1:]):
                pair_counts[q] = pair_counts.get(q, 0) - c
                touched.add(q)
            out: list[int] = []
            i = 0
            while i < len(ids):
                if i < len(ids) - 1 and (ids[i], ids[i + 1]) == pair:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(ids[i])
                    i += 1
            for q in zip(out, out[1:]):
                pair_counts[q] = pair_counts.get(q, 0) + c
                pair_words.setdefault(q, set()).add(wi)
                touched.add(q)
            words[wi] = out
        pair_counts.pop(pair, None)
        touched.discard(pair)
        # push fresh heap entries for every touched pair (lazy deletion:
        # stale entries are skipped/reinserted at pop time)
        for q in touched:
            c = pair_counts.get(q, 0)
            if c > 0:
                heapq.heappush(heap, (-c, q))
    return BpeVocab(merges=merges)


def word_counts_df(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed corpus word-frequency table: (word, cnt).

    Pre-tokenization here is a simplified JVM-side split (letter runs /
    digit runs / symbol runs with leading space, lowercase-free) matching
    `pretokenize`; the shuffle carries only (word, partial_count)."""
    # Java regex mirroring _PRETOKEN_RE (passed as a lit column — no SQL
    # string-literal escaping). Java \w/\W are ASCII vs Python's unicode
    # default: identical on the ASCII fixture corpora (tested); at real
    # scale pass (?U) flags if the corpus is unicode-heavy.
    pat = r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+"
    words = df.select(
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int = 100_000,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> BpeVocab:
    """Train a BPE vocab on a corpus DataFrame.

    The distributed stage computes word counts (optionally on a
    deterministic sample — at 10^12 docs a 1e-4 sample still sees every
    word that could matter); only the top `max_words` rows by count are
    collected (bounded driver transfer ≤ a few MB), then the sequential
    merge loop runs locally. Zipf's law makes the top-K cap nearly
    lossless for merge selection."""
    if sample_fraction is not None and sample_fraction < 1.0:
        df = df.sample(fraction=sample_fraction, seed=seed)
    wc = word_counts_df(df, text_col)
    top = (
        wc.orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(int(max_words))  # TakeOrdered — no full sort/shuffle of the dict
        .collect()
    )
    return train_bpe_from_word_counts({r["word"]: r["cnt"] for r in top}, n_merges)


# ---------------------------------------------------------------------------
# distributed encode
# ---------------------------------------------------------------------------


def bpe_encode(
    df: DataFrame,
    vocab: BpeVocab,
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Append `out_col: array<int>` = BPE token ids of `text_col`.

    Arrow-batched mapInPandas kernel; the merge-rank dict rides in the
    closure (one copy per executor, like the SRP plane matrices in
    operators/similarity.py). A per-batch word→ids cache exploits Zipf:
    encode_word runs once per distinct pre-token per batch."""
    from pyspark.sql import types as T

    merges = vocab.merges
    other_cols = [f.name for f in df.schema.fields]
    # copy, don't .add(): StructType.add mutates the DataFrame's cached
    # schema object in place and corrupts later plan resolution.
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.IntegerType()))]
    )

    def encode_batches(batches):
        ranks = {tuple(p): _BASE_VOCAB + i for i, p in enumerate(merges)}
        cache: dict[str, list[int]] = {}

        def enc(text):
            if text is None:
                return None
            out: list[int] = []
            for w in _PRETOKEN_RE.findall(text):
                ids = cache.get(w)
                if ids is None:
                    ids = encode_word(w.encode("utf-8"), ranks)
                    cache[w] = ids
                out.extend(ids)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(enc)
            yield pdf[other_cols + [out_col]]

    return df.mapInPandas(encode_batches, schema=schema)


_FP_MULT = 1_000_003
_FP_MOD = 2_147_483_647  # Mersenne 2^31-1, shared with dedup's portable hashes


def encode_words_fingerprint(
    df: DataFrame,
    vocab: BpeVocab,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Driver-gate shape of the BPE encoder: (doc_id, n_tok, tok_fp).

    Semantics (chosen to be replayable by a DuckDB recursive-CTE oracle,
    __spark_entry__._bpe_encode_sql): pre-tokens are lowercased whitespace
    words (no space marker), each encoded independently with the frozen
    merge table, concatenated in word order; tok_fp is the polynomial fold
    (acc·1000003 + id) mod 2^31−1 over the full token sequence — a
    value-exact gate on every token id AND their order, compact enough to
    hash-compare. Zero-word docs emit (0, 0).

    The corpus tables are ASCII (codepoint == UTF-8 byte), which is what
    makes the SQL `ascii()` base alphabet equal to the kernel's UTF-8
    bytes; the kernel itself encodes real UTF-8 so non-ASCII corpora still
    tokenize correctly (only the SQL-oracle equivalence is ASCII-scoped).
    """
    from pyspark.sql import types as T

    merges = vocab.merges

    def kernel(batches):
        ranks = {tuple(p): _BASE_VOCAB + i for i, p in enumerate(merges)}
        cache: dict[str, list[int]] = {}
        for pdf in batches:
            ids_out, n_out, fp_out = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[int] = []
                for w in (text or "").lower().split():
                    ids = cache.get(w)
                    if ids is None:
                        ids = encode_word(w.encode("utf-8"), ranks)
                        cache[w] = ids
                    toks.extend(ids)
                fp = 0
                for t in toks:
                    fp = (fp * _FP_MULT + t) % _FP_MOD
                ids_out.append(doc_id)
                n_out.append(len(toks))
                fp_out.append(fp)
            yield pd.DataFrame({id_col: ids_out, "n_tok": n_out, "tok_fp": fp_out})

    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("n_tok", T.LongType()),
            T.StructField("tok_fp", T.LongType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(kernel, schema)


def tokenize_corpus(
    df: DataFrame,
    vocab: BpeVocab,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """prep-pipeline Tokenize contract: (id, source, tokens, n_tok)."""
    enc = bpe_encode(
        df.select(id_col, F.col(source_col).alias("source"), text_col),
        vocab,
        text_col=text_col,
    )
    return enc.select(
        id_col, "source", "tokens", F.size("tokens").cast("int").alias("n_tok")
    )
