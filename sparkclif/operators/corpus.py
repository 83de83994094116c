"""Corpus-level text pipeline operators — transformations whose
semantics depend on CORPUS statistics, not just the row: boilerplate
segment removal (C4/CCNet-style line dedup, restated over the
testbed's newline-free word-salad docs as fixed-width word segments),
corpus-frequency rarity scoring, and overlapping-window chunking for
context-length packing.

All three stay JVM-side (array/higher-order expressions, no Python in
the hot path); the corpus statistics are classic two-pass shapes —
a map-side-combinable aggregation producing a small frequency table
that broadcasts back over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparkclif.operators.text import tokens


def word_segments(text: Column | str, width: int = 2) -> Column:
    """Non-overlapping ``width``-word segments of a document, in
    order; a trailing remnant shorter than ``width`` is dropped (both
    engines then agree on the segment count without a ragged-tail
    convention). The testbed stand-in for "lines" — the unit of
    boilerplate detection. Token array bind-bound (see expr.bind)."""
    from sparkclif.operators.expr import bind

    def segs(t: Column) -> Column:
        n_segs = (F.size(t) / width).cast("long")
        idx = F.when(
            n_segs > 0, F.sequence(F.lit(0).cast("long"), n_segs - 1)
        ).otherwise(F.array().cast("array<long>"))
        return F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.slice(t, (i * width + 1).cast("int"), width)),
        )

    return bind(tokens(text), segs)


def boilerplate_removal(
    docs: DataFrame,
    min_docs: int = 25,
    width: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove boilerplate segments — segments occurring in at least
    ``min_docs`` DISTINCT documents (headers, navigation chrome,
    license banners at web scale). Returns one row per doc:
    (id, n_segs, n_boiler, clean_text) where clean_text is the
    non-boilerplate segments rejoined in document order.

    Plan: one segment explode; a (segment -> doc-frequency) aggregation
    with map-side partial combine; the frequency table filtered to
    boilerplate is TINY by construction (only segments shared by
    >= min_docs docs survive — heavy hitters), so it broadcasts back
    onto the exploded scan; one final per-doc groupBy rebuilds the
    document. Two shuffles total (df agg + rebuild), both on keys with
    bounded skew (segment df caps at n_docs; doc_id is unique).

    Precondition: ``docs`` has ONE ROW PER ``id_col`` (an entity
    table). Document frequency is computed by deduping each row's
    segments scan-side and counting rows — duplicate id rows would
    each contribute, inflating df (dropDuplicates(id_col) upstream if
    your input is a union of corpus slices).
    """
    # ONE segmentation subtree feeds both consumers (the per-position
    # stream and the document-frequency branch); cost-dispatched
    # materialization (maybe_local_checkpoint, r7): below
    # MATERIALIZE_INPUT_BYTES each branch re-runs the segment HOF —
    # cheaper than a checkpoint at toy scale — but at corpus scale the
    # checkpoint deletes one full segmentation pass over the input.
    from sparkclif.operators.rank import maybe_local_checkpoint

    base = maybe_local_checkpoint(
        docs.select(id_col, word_segments(text_col, width).alias("__segs")),
        size_of=docs,
    )
    segs = base.select(
        id_col, F.posexplode_outer("__segs").alias("pos", "seg")
    )
    # document frequency WITHOUT a countDistinct aggregate: dedup each
    # doc's segments scan-side (cheap array op), then a plain count —
    # one fully map-side-combinable aggregation instead of the
    # distinct-aggregate's expand + two-phase shuffle
    boiler = (
        base.select(F.explode(F.array_distinct("__segs")).alias("seg"))
        .groupBy("seg")
        .agg(F.count("*").alias("__df"))
        .where(F.col("__df") >= min_docs)
        .select("seg", F.lit(1).alias("__boiler"))
    )
    flagged = segs.join(F.broadcast(boiler), "seg", "left")
    # collect_list discards NULL inputs, so boilerplate/absent segments
    # vanish here and only kept segments are sorted back into doc order
    kept = F.array_sort(
        F.collect_list(
            F.when(
                F.col("__boiler").isNull() & F.col("seg").isNotNull(),
                F.struct("pos", "seg"),
            )
        )
    )
    return flagged.groupBy(id_col).agg(
        F.count("seg").cast("long").alias("n_segs"),
        F.coalesce(F.sum("__boiler"), F.lit(0)).cast("long").alias("n_boiler"),
        F.array_join(F.transform(kept, lambda s: s["seg"]), " ").alias("clean_text"),
    )


def rarity_score(
    docs: DataFrame,
    rare_df_pct: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-frequency rarity score: per document, how many of its
    token OCCURRENCES are of rare types — types whose document
    frequency is at most ``rare_df_pct`` percent of the corpus. The
    quality signal is two-sided: high rarity flags junk/OCR noise,
    zero rarity flags template text. All arithmetic is integral
    (``rare_bp`` is basis points by integer division), so the SQL
    restatement is exact.

    Plan (r8): the token stream NEVER shuffles. Document frequency
    dedups each doc's tokens scan-side (``array_distinct``, the
    boilerplate_removal move) and counts rows — a vocabulary-sized
    map-side-combined aggregation, deleting the r7 shape's
    (doc, tok)-cardinality tf exchange outright (its only purpose was
    deriving df; at 100 TB that shuffle was the dominant byte mover).
    The COMMON set (df above threshold) joins back onto the raw
    occurrence stream by broadcast and rare = not-common; the final
    per-doc aggregation partial-combines to one row per doc before
    its exchange. Broadcasting the common side, not the rare side, is
    what scales: under a Zipfian vocabulary the tokens ABOVE a df
    threshold are a few hundred stopword-like types no matter the
    corpus size, while the rare tail IS the vocabulary — broadcasting
    it would ship billions of rows to every executor. The corpus size
    scalar is a 1-row broadcast cross join, not a driver-side
    ``.count()`` — the plan stays pure/cacheable and the oracle's
    scalar subquery matches.

    Precondition: one row per ``id_col`` (see boilerplate_removal —
    df counts one tf row per (doc, tok)).
    """
    # ONE tokenize subtree feeds both consumers (the occurrence stream
    # and the scan-side-deduped df branch); cost-dispatched
    # materialization: below MATERIALIZE_INPUT_BYTES each branch
    # re-runs the tokenizer HOF — cheaper than a checkpoint at toy
    # scale — while at corpus scale the checkpoint deletes one full
    # tokenize pass (see sparse_cosine_pairs for the localCheckpoint
    # honesty/cluster notes).
    from sparkclif.operators.rank import maybe_local_checkpoint

    base = maybe_local_checkpoint(
        docs.select(id_col, tokens(text_col).alias("__toks")),
        size_of=docs,
    )
    n_docs = docs.agg(F.count("*").cast("long").alias("__n_docs"))
    common = (
        base.select(F.explode(F.array_distinct("__toks")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("__df") * 100 > F.col("__n_docs") * rare_df_pct)
        .select("tok", F.lit(1).alias("__common"))
    )
    stream = base.select(id_col, F.explode("__toks").alias("tok"))
    marked = stream.join(F.broadcast(common), "tok", "left")
    counted = marked.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_toks"),
        F.sum(F.when(F.col("__common").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_rare"),
    )
    # integer `div`, never a double quotient: floor(double) can land
    # one off when the exact ratio is representable
    return counted.withColumn("rare_bp", F.expr("(n_rare * 10000) div n_toks"))


def segment_dedup(
    docs: DataFrame,
    width: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    force: str | None = None,
) -> DataFrame:
    """Corpus-wide segment deduplication, keep-first: every occurrence
    of a ``width``-word segment EXCEPT the globally first one (by
    ``(doc_id, pos)``) is removed. This is C4's span-dedup rule
    (Raffel et al. 2020 discard repeated three-sentence spans; the
    newline-free testbed restates spans as fixed-width word segments),
    and it is distinct from ``boilerplate_removal``: boilerplate drops
    ALL occurrences of high-df segments, span dedup keeps exactly one
    canonical occurrence of EVERY repeated segment.

    Returns one row per document: ``(id, n_segs, n_removed,
    clean_text)`` with ``clean_text`` the surviving segments rejoined
    in document order (empty/short docs keep their row via the outer
    explode).

    Plan, cost-dispatched like ``rank.exact_percentiles``:

    - Above SMALL_INPUT_BYTES (default): one segment posexplode; the
      winner per segment is a ``min(struct(doc_id, pos))`` aggregation
      — fully map-side combinable, so a segment duplicated a billion
      times contributes one row per map task to the shuffle, not a
      billion; then a shuffle join back on ``seg`` (the winner table
      is distinct-segment-sized — the corpus vocabulary — so it can
      NEVER broadcast; both sides hash-partition on ``seg`` and AQE's
      skew split handles mass-duplicated segments); one final per-doc
      groupBy rebuilds documents.
    - Below it: the same ``min(struct)`` as a whole-partition window
      over ``seg`` — one scan/explode instead of the join path's two
      and one fewer barrier (measured ~25% at sf0.1). Identical
      output; NOT the default at scale because a window partition
      cannot be skew-split by AQE the way the join can.

    Precondition: one row per ``id_col``. ``force`` ("join" |
    "window") pins a path for tests.
    """
    from sparkclif.operators.rank import SMALL_INPUT_BYTES, plan_size_bytes, validate_force

    validate_force(force, {"join", "window"})
    if force is None:
        size = plan_size_bytes(docs)
        force = "window" if size <= SMALL_INPUT_BYTES else "join"
    segs = docs.select(
        id_col, F.posexplode_outer(word_segments(text_col, width)).alias("pos", "seg")
    )
    # min(struct) orders lexicographically (doc_id, then pos) — the
    # global first occurrence; both fields are non-null where seg is
    if force == "window":
        flagged = segs.withColumn(
            "__first",
            F.when(
                F.col("seg").isNotNull(),
                F.min(F.struct(id_col, "pos")).over(Window.partitionBy("seg")),
            ),
        )
    else:
        winners = (
            segs.where(F.col("seg").isNotNull())
            .groupBy("seg")
            .agg(F.min(F.struct(id_col, "pos")).alias("__first"))
        )
        flagged = segs.join(winners, "seg", "left")
    is_kept = F.col("seg").isNotNull() & (
        F.struct(id_col, "pos") == F.col("__first")
    )
    kept = F.array_sort(
        F.collect_list(F.when(is_kept, F.struct("pos", "seg")))
    )
    return flagged.groupBy(id_col).agg(
        F.count("seg").cast("long").alias("n_segs"),
        F.sum(F.when(F.col("seg").isNotNull() & ~is_kept, 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.array_join(F.transform(kept, lambda s: s["seg"]), " ").alias("clean_text"),
    )


def bigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus bigram language-model fluency score — the CCNet/Gopher
    LM-quality-filter shape (Wenzek et al. 2020 score documents with
    a small LM; here the LM is a bigram model trained on the corpus
    itself). Per document, the mean add-one-smoothed conditional
    probability of its bigrams, in exact integer basis points:

        p_bp(w1, w2) = ((c12 + 1) * 10000) div (c1 + V)
        lm_score_bp  = sum(p_bp over doc bigrams) div n_bigrams

    where ``c12`` counts corpus occurrences of the bigram, ``c1``
    counts bigrams whose left token is ``w1`` (the conditional
    denominator), and ``V`` is the corpus vocabulary size (add-one
    smoothing mass). High score = made of common continuations
    (fluent/template), low = improbable juxtapositions (junk, OCR
    noise). Integer ``div`` end-to-end keeps the SQL restatement
    exact. Documents with < 2 tokens keep their row with
    ``n_bigrams = 0`` and a NULL score.

    Plan: the tokenized corpus is materialized ONCE (localCheckpoint)
    and feeds every consumer; bigram occurrences are built from it
    scan-side (zip of the token array with itself shifted — no
    self-join, no window); the two
    count tables are map-side-combinable aggregations producing
    vocabulary-sized relations, joined on ``w1`` and then back onto
    the bigram scan on ``(w1, w2)`` — both shuffle joins on key
    distributions with Zipfian heads (AQE skew split; neither side is
    broadcastable at corpus scale, same argument as rarity_score's
    rare tail); ``V`` is a 1-row broadcast cross join. Final per-doc
    groupBy is map-side combinable. Precondition: one row per
    ``id_col``.
    """
    from sparkclif.operators.expr import bind

    def bigrams(t: Column) -> Column:
        # slice length must be >= 0: guard the < 2-token case
        n = F.size(t)
        return F.when(
            n >= 2,
            F.zip_with(
                F.slice(t, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    # ONE tokenize pass: the tokenized corpus is materialized
    # (localCheckpoint — see sparse_cosine_pairs for the honesty/
    # cluster notes) and every consumer — bigram stream for the c12
    # count, bigram stream again for scoring (explode_outer variant),
    # and vocabulary — derives from it with cheap array ops.
    # Without this the lineage re-ran the regex tokenizer THREE times
    # (c12 branch, score branch, vocab branch): at 100 TB that is two
    # extra corpus scans, and the materialization is no larger than
    # the bigram shuffle the pipeline already pays. Cost-dispatched
    # (maybe_local_checkpoint): below MATERIALIZE_INPUT_BYTES the
    # shared bg exchange is ReusedExchange-deduped and only the cheap
    # vocab branch re-tokenizes — the checkpoint costs more than it
    # saves (measured -0.33 s at sf0.1, identical output).
    from sparkclif.operators.rank import maybe_local_checkpoint

    toks = maybe_local_checkpoint(
        docs.select(
            id_col,
            tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__toks"),
        ),
        size_of=docs,
    )

    # <2-token docs are identified SCAN-SIDE (size < 2 on the shared
    # toks relation) and re-enter as constant zero rows via a cheap
    # union AFTER the per-doc aggregation — this deletes the old
    # keep-every-doc base relation (a 4th corpus scan) and its
    # left-outer doc_id join (one more exchange + sort): 7 -> 6
    # exchanges at sf0.1, one fewer corpus pass at 100 TB (VERDICT r7
    # item 5). Deliberately NOT explode_outer + left join: the NULL
    # placeholder keys would all hash to ONE partition whenever the
    # probe join shuffles (p too big to broadcast at corpus scale) —
    # a skew funnel sized by the trash-doc count; the union shape
    # keeps NULL keys out of every exchange.
    bg = (
        toks.select(
            id_col,
            F.explode(bind(F.col("__toks"), bigrams)).alias("bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    )
    # NO forced bigram-stream exchange (r7: deletes the r6
    # repartition("w1","w2")): the c12 aggregation partial-aggregates
    # map-side, so ITS exchange carries vocabulary²-sized combined
    # rows, not the raw stream — forcing a raw-stream shuffle just so
    # the probe join could reuse it moved strictly more bytes whenever
    # the count table broadcasts (AQE does so well past bench scale),
    # and the same bytes when it doesn't (probe SMJ shuffles raw bg
    # either way). Measured −0.2 s warm at sf0.1 with the identical
    # result; above MATERIALIZE_INPUT_BYTES the checkpointed toks
    # keeps the branches to one corpus scan.

    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("__c12"))
    # c1 derives FROM c12 (c1(w1) = Σ_w2 c12(w1, w2)) — a vocabulary²-
    # sized re-aggregation instead of a second full corpus scan +
    # bigram shuffle; at 100 TB this deletes one pass over the stream
    c1 = c12.groupBy("w1").agg(F.sum("__c12").alias("__c1"))
    # vocabulary size: per-doc distinct scan-side, then a global
    # distinct count stated as an aggregation (map-side combinable)
    vocab = (
        toks.select(F.explode(F.array_distinct("__toks")).alias("tok"))
        .groupBy("tok")
        .agg(F.lit(1).alias("__one"))
        .agg(F.count("*").cast("long").alias("__v"))
    )
    p = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.expr("((__c12 + 1) * 10000) div (__c1 + __v)").alias("__p_bp"),
        )
    )
    # INNER join: every bigram in bg matches p by construction (p is
    # keyed by the distinct bigrams of this very stream), so the agg
    # sees exactly the docs with >= 2 tokens; the short docs re-enter
    # as constant zero rows from the shared toks relation (a
    # vocab-free projection — no join, no exchange, and the rows are
    # emitted scan-side co-partitioned with nothing).
    scored = bg.join(p, ["w1", "w2"]).groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("__p_bp").cast("long").alias("sum_p_bp"),
    )
    short = toks.filter(F.size("__toks") < 2).select(
        id_col,
        F.lit(0).cast("long").alias("n_bigrams"),
        F.lit(0).cast("long").alias("sum_p_bp"),
    )
    return scored.unionByName(short).select(
        id_col,
        "n_bigrams",
        "sum_p_bp",
        F.expr("CASE WHEN n_bigrams > 0 THEN sum_p_bp div n_bigrams END")
        .cast("long")
        .alias("lm_score_bp"),
    )


def bpe_pair_counts(
    docs: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """The byte-pair-encoding merge-selection step (Sennrich et al.
    2016): count adjacent symbol pairs across the corpus, weighted by
    word frequency, and return the ``top_k`` merge candidates — the
    inner loop of tokenizer training. Returns
    ``(left_sym, right_sym, pair_count, rank)`` with rank 1 = the pair
    a BPE trainer would merge next (here symbols are single characters
    — the first merge round; later rounds re-run on re-segmented
    vocabularies, same plan shape).

    The scale insight this plan encodes: pair counting runs over the
    VOCABULARY, not the corpus. Stage 1 collapses the corpus to a
    (word -> count) table with one fully map-side-combined aggregation
    — a trillion-token corpus becomes a few-million-row relation.
    Stage 2 explodes adjacent character pairs of each vocabulary entry
    (work = vocab × word-length, corpus-size-independent) and sums
    ``wc`` per pair — again map-side combined, and the pair-key space
    is alphabet², so the final shuffle is tiny. Stage 3's global
    top-k is a sort+limit, which Spark executes as TakeOrdered (per-
    partition heaps + driver merge of top_k rows), never a full sort.
    Ties are broken by (left_sym, right_sym) so the boundary is
    deterministic. Single-symbol words contribute no pairs; a pair
    repeated inside one word counts once per position per occurrence.
    """
    wf = word_freqs(docs, text_col)
    return pair_counts_from_vocab(wf, top_k)


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, wc) vocabulary table, one fully map-side-
    combined aggregation — the stage-1 collapse every tokenizer plan
    here starts from (a trillion-token corpus becomes a few-million-
    row relation)."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def pair_counts_from_vocab(wf: DataFrame, top_k: int = 20) -> DataFrame:
    """Adjacent-char pair counts weighted by word frequency over an
    existing (word, wc) vocabulary — the merge-selection stage split
    out so a caller that already built the vocabulary (bpe_encode)
    shares one corpus scan with it."""
    # adjacent (char i, char i+1) pairs; sequence() must be guarded —
    # sequence(1, 0) steps DOWNWARD in Spark, it is not empty
    pairs = F.when(
        F.length("word") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("word") - 1),
            lambda i: F.struct(
                F.substring(F.col("word"), i, F.lit(1)).alias("l"),
                F.substring(F.col("word"), i + 1, F.lit(1)).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    counted = (
        wf.select(F.col("wc"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym"))
        .agg(F.sum("wc").cast("long").alias("pair_count"))
    )
    order = [F.desc("pair_count"), F.col("left_sym"), F.col("right_sym")]
    top = counted.orderBy(*order).limit(top_k)
    # rank AFTER the limit: the global sort+limit above runs as
    # TakeOrdered (per-partition heaps, driver merge of top_k rows);
    # the single-task window below only ever sees top_k rows
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("int")
    )


# Symbol separator for the packed-string BPE fold. A control char no
# whitespace tokenizer emits (regex \s does NOT match \x1f, but the
# corpus contract is printable text — tokens can never contain it), so
# symbol boundaries survive arbitrary token content.
BPE_SEP = "\x1f"


def _bpe_merge_pass(packed: Column, left: Column, right: Column) -> Column:
    """ONE left-to-right greedy merge pass of (left, right) -> the
    concatenated symbol, over a BPE_SEP-packed symbol string. The fold
    appends symbols one at a time; when the incoming symbol equals
    ``right`` and the accumulator's LAST symbol is exactly ``left``,
    it appends WITHOUT a separator — which is precisely the merge
    (the trailing symbol becomes left||right). Greedy-non-overlapping
    falls out ('aaa' under (a,a) -> [aa, a], the merged symbol never
    re-matches as its own left within the same pass). A NULL merge
    (fewer learned merges than passes) is a no-op: every comparison
    is NULL, every branch falls through to plain append — identically
    in the DuckDB restatement's CASE. Packed strings, not arrays,
    because DuckDB's list_reduce needs a type-homogeneous fold; the
    Spark side mirrors the representation so both engines run the
    character-identical recurrence."""
    return F.aggregate(
        F.split(packed, BPE_SEP),
        F.lit(""),
        lambda acc, s: F.when(acc == "", s)
        .when(
            (s == right)
            & ((acc == left) | acc.endswith(F.concat(F.lit(BPE_SEP), left))),
            F.concat(acc, s),
        )
        .otherwise(F.concat(acc, F.lit(BPE_SEP), s)),
    )


def bpe_encode_rollup(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """APPLY a learned BPE merge table — the encode step that
    completes the tokenizer story bpe_pair_counts (merge selection)
    begins: every vocabulary word is segmented to characters, the
    top-``n_merges`` corpus pair-merges are applied in rank order
    (each one greedy left-to-right pass — the fixed-merge-table
    simplification of Sennrich et al. 2016's iterative re-count), and
    the encoded vocabulary rolls up per word length:
    ``(word_len, n_words, total_wc, total_tokens_wc, avg_tokens,
    example_word, example_enc)`` — corpus-weighted token counts a
    tokenizer owner reads as the compression curve.

    Scale shape: ONE corpus scan builds the (word, wc) vocabulary
    (map-side combined), localCheckpointed because BOTH the merge
    table and the encode read it — without the checkpoint each branch
    would re-scan the corpus. The merge table collapses to ONE row
    (the top-k pairs collected into one rank-ordered array) and
    broadcast-joins back over the vocabulary; all encode work is
    vocabulary-sized (corpus-size-independent) and the two-level
    dynamic merge fold runs in
    whole-stage codegen — no Python, no explode of the corpus. The
    final rollup keys on word length (bounded by max word length).
    """
    wf = word_freqs(docs, text_col).localCheckpoint(eager=False)
    ranked = pair_counts_from_vocab(wf, top_k=n_merges)
    # The merge table as ONE rank-ordered array in ONE row (not an
    # l1..r20 max-CASE pivot feeding 20 statically-unrolled passes):
    # the encode is then a DYNAMIC two-level fold — outer aggregate()
    # over the merges array, inner merge pass per element. Same
    # recurrence, but analyzer work drops from 20 nested lambda scopes
    # to 2: plan CONSTRUCTION measured 1.85 s -> 0.76 s warm at sf0.1
    # (the unrolled form's analysis dominated its own execution;
    # SCALE.md round-9). A merge list shorter than n_merges simply
    # folds fewer passes — identical to the unrolled form's NULL
    # no-op passes.
    mrow = ranked.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "rank",
                        F.col("left_sym").alias("l"),
                        F.col("right_sym").alias("r"),
                    )
                )
            ),
            lambda x: F.struct(x["l"].alias("l"), x["r"].alias("r")),
        ).alias("merges")
    )
    joined = wf.crossJoin(F.broadcast(mrow))
    packed0 = F.array_join(F.split(F.col("word"), ""), BPE_SEP)
    packed = F.aggregate(
        "merges", packed0, lambda acc, m: _bpe_merge_pass(acc, m["l"], m["r"])
    )
    enc = joined.select(
        F.length("word").cast("int").alias("word_len"),
        F.col("word"),
        F.col("wc"),
        packed.alias("packed"),
    ).withColumn("n_tokens", F.size(F.split(F.col("packed"), BPE_SEP)))
    return enc.groupBy("word_len").agg(
        F.count("*").alias("n_words"),
        F.sum("wc").cast("long").alias("total_wc"),
        F.sum(F.col("wc") * F.col("n_tokens")).cast("long").alias("total_tokens_wc"),
        # UNROUNDED by design: one IEEE division of exact small
        # integers is bit-identical cross-engine, while round(4) sits
        # on decimal half-boundaries where Spark's BigDecimal HALF_UP
        # and DuckDB's raw-double rounding diverge by one last-digit
        # ulp (the i_quality_classifier score rule; review r9 —
        # sum/count quotients like 113/800 = 0.14125 DO terminate
        # exactly on the boundary)
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("avg_tokens"),
        F.min("word").alias("example_word"),
        F.min_by(
            F.replace(F.col("packed"), F.lit(BPE_SEP), F.lit("+")), F.col("word")
        ).alias("example_enc"),
    )


def chunk_overlap(
    docs: DataFrame,
    chunk: int = 16,
    stride: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking — the context-length splitter
    of a pretraining pipeline (chunk tokens per window, advancing by
    stride, so consecutive chunks share chunk - stride tokens).
    Chunk count is 1 + ceil(max(n - chunk, 0) / stride): every token
    is covered, the final chunk may run short, and an empty document
    still yields its one (empty) chunk so no row silently vanishes.

    Purely scan-side — sequence/slice/explode array expressions, zero
    shuffle, zero Python; at 100 TB this is the shape you want feeding
    a shard writer (compose with sampling.shard_interleave).
    """
    # NULL text behaves as empty text (its one empty chunk) — without
    # the coalesce, size(NULL)=-1 leaks a (n_chunk_toks=-1, NULL) row
    from sparkclif.operators.expr import bind

    text = F.col(text_col) if isinstance(text_col, str) else text_col

    def chunks(t: Column) -> Column:
        n_chunks = F.lit(1) + F.ceil(
            F.greatest(F.size(t) - chunk, F.lit(0)).cast("double") / stride
        ).cast("long")
        return F.transform(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1),
            lambda i: F.slice(t, (i * stride + 1).cast("int"), chunk),
        )

    # token array bind-bound: referenced bare in the lambda it would be
    # re-split once per chunk (see expr.bind)
    pieces = bind(tokens(F.coalesce(text, F.lit(""))), chunks)
    return docs.select(
        id_col, F.posexplode(pieces).alias("chunk_id", "__ctoks")
    ).select(
        id_col,
        F.col("chunk_id").cast("long"),
        F.size("__ctoks").cast("long").alias("n_chunk_toks"),
        F.array_join("__ctoks", " ").alias("chunk_text"),
    )
