"""End-to-end training-corpus preparation: one call from raw documents
to packed, split, deduplicated training shards plus a stage-by-stage
accounting report.

The composite a training-data team actually runs, assembled from the
engine's individually-verified operators in the canonical order:

    quality gate      (textquality.filter_quality — Gopher-style rules)
    perplexity gate   (lmfilter — CCNet-style learned rule; optional,
                       max_ppl under a self-trained bigram LM)
    exact dedup       (md5(text) groupBy, keep min doc_id)
    near-dup dedup    (minhash signatures -> capped LSH band buckets ->
                       connected components -> keep representative)
    semantic dedup    (semdedup — optional, corpora with an embedding
                       column: SemDeDup over centroid cells)
    decontamination   (decontaminate.decontaminate vs eval-set frames)
    targeted select   (dsir — optional, dsir_frac + a target corpus:
                       Gumbel top-k importance resampling toward the
                       target's hashed-n-gram distribution)
    split assignment  (sampling.assign_split — deterministic hash bands)
    tokenize          (real byte-level BPE — operators/bpe.py — when
                       the config carries/learns merges; deterministic
                       word-hash tokens otherwise; pass-through when
                       the corpus already carries a token-array column)
    pack              (packing.pack_sequences — mapInArrow
                       concat-and-chunk into exact seq_len rows)

Scale shape: every stage is the already-benchmarked distributed form —
no stage introduces a new join/shuffle class beyond what its operator
documents. Stage counts are collected once per stage boundary (one
tiny agg each); the packed output is written per split with Spark's
parquet writer. Deterministic end to end given (input, seed).

Reference parity note: the reference validates and quarantines; this
composite is the "beyond the reference" LLM-pipeline mandate
(SURVEY.md §2.10) assembled into the deliverable artifact — packed
training shards.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from .components import connected_components
from .decontaminate import decontaminate
from .dedup_index import band_keys, minhash_signatures
from .packing import pack_sequences
from .sampling import assign_split
from .textquality import QualityThresholds, filter_quality


@dataclass
class CorpusConfig:
    seq_len: int = 2048
    eos_id: int = 0
    pad_id: int = 0
    vocab_size: int = 50_257
    seed: int = 0
    quality: bool = True
    thresholds: QualityThresholds | None = None
    # Perplexity gate (operators/lmfilter, the CCNet-style learned
    # quality rule): None = off; else drop documents whose perplexity
    # under a self-trained add-one bigram LM is >= max_ppl. Runs
    # after the written quality rules, before dedup, over the same
    # unit column the other gates use (text or token ids). In the
    # incremental pipeline the LM is FROZEN at the first window
    # (lm_max_bigrams caps the persisted model; cut mass backs off).
    max_ppl: float | None = None
    lm_min_count: int = 1
    lm_max_bigrams: int = 250_000
    # Semantic dedup (operators/semdedup, SemDeDup): runs after the
    # token-level near-dup stage when the corpus carries an
    # ``embedding`` column — near-identical MEANING with different
    # surface tokens (translations, paraphrases, re-crawls) that
    # minhash cannot see. Seed centroids are the semantic_cells
    # smallest doc ids (deterministic; works for string ids).
    semantic_dedup: bool = False
    semantic_tau: float = 0.7
    semantic_cells: int = 64
    # DSIR targeted selection (operators/dsir, Xie et al. 2023):
    # None = off; else keep round(dsir_frac * pool) documents drawn by
    # Gumbel top-k importance resampling toward the hashed-n-gram
    # distribution of a TARGET corpus (prepare_corpus(dsir_target=...)).
    # Runs after decontamination — the selection budget is spent on the
    # clean, deduplicated pool only. In the incremental pipeline both
    # the model and the admission cutoff are FROZEN at the first
    # window, like the perplexity LM.
    dsir_frac: float | None = None
    dsir_buckets: int = 8192
    dsir_grams: tuple = (1, 2)
    dsir_alpha: float = 1.0
    exact_dedup: bool = True
    near_dup: bool = True
    decontaminate_ngram: int = 8
    decontaminate_min_hits: int = 1
    splits: dict = field(
        default_factory=lambda: {"train": 0.98, "val": 0.01, "test": 0.01}
    )
    # Tokenizer: explicit merge rules -> byte-level BPE encode
    # (operators/bpe.py); bpe_learn_merges > 0 with no rules -> learn
    # that many merges from the post-dedup corpus first (one
    # word-histogram agg + capped driver learn), then encode; neither
    # -> the hash stand-in.
    bpe_merges: list | None = None
    bpe_learn_merges: int = 0
    bpe_max_words: int = 1_000_000
    # Fill-in-the-middle mix (operators/fim.py): fraction of documents
    # rewritten PSM/SPM after tokenize, before packing (0 = off). The
    # gate/cuts hash (seed, doc_id), so batch and incremental
    # pipelines transform identically. Sentinel ids are required when
    # fim_rate > 0 and should live outside the content vocabulary.
    fim_rate: float = 0.0
    fim_mode: str = "psm"
    fim_pre_id: int | None = None
    fim_mid_id: int | None = None
    fim_suf_id: int | None = None

    def validate_fim(self) -> None:
        if self.fim_rate > 0 and None in (
            self.fim_pre_id, self.fim_mid_id, self.fim_suf_id
        ):
            raise ValueError(
                "fim_rate > 0 needs fim_pre_id/fim_mid_id/fim_suf_id"
            )

    def apply_fim(self, df, id_col: str):
        """The shared post-tokenize FIM stage (no-op at rate 0)."""
        if self.fim_rate <= 0:
            return df
        from .fim import fim_transform

        return fim_transform(
            df,
            self.fim_pre_id,
            self.fim_mid_id,
            self.fim_suf_id,
            rate=self.fim_rate,
            seed=self.seed,
            mode=self.fim_mode,
            id_col=id_col,
        ).drop("fim_applied")


def content_hash_expr(col: str, is_text: bool) -> F.Column:
    """The exact-dedup content key, shared by the batch pipeline and
    the incremental one (corpus_sync) so both gate on identical
    hashes: md5 of the text bytes, or 128 bits from two seeded
    xxhash64 passes over the raw token array (no string
    materialization of 10^3-token rows)."""
    if is_text:
        return F.md5(F.col(col).cast("binary"))
    return F.concat(
        F.hex(F.xxhash64(F.lit(0), F.col(col))),
        F.hex(F.xxhash64(F.lit(1), F.col(col))),
    )


def hash_tokenize(
    docs: DataFrame, text: str = "text", vocab_size: int = 50_257
) -> DataFrame:
    """Deterministic word-hash tokenizer: token = pmod(xxhash64(word),
    vocab_size). Pure JVM HOF (map-only); a stand-in with the real
    tokenizer's SHAPE (text -> array<int> bounded by vocab) so the
    packing/splitting plumbing downstream is the production path. A
    real BPE runs as a pandas UDF in the same position."""
    toks = F.transform(
        F.split(F.col(text), " "),
        lambda w: F.pmod(F.xxhash64(w), F.lit(vocab_size)).cast("int"),
    )
    return docs.withColumn("tokens", toks)


def near_dup_representatives(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Docs minus non-representative near-duplicates.

    minhash signatures (engine default xxhash64 scheme) -> capped LSH
    band buckets (dedup_index.capped_band_lists — the production
    POSTING_CAP witness rule) -> candidate pairs
    (dedup_index.band_candidate_pairs, JVM-side from the capped
    lists) -> connected components -> keep each component's minimum
    id. Docs outside any component pass through.
    """
    from .dedup_index import band_candidate_pairs, capped_band_lists

    sig = minhash_signatures(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text).alias("text")),
        keep_short=False,
    )
    pairs = (
        band_candidate_pairs(capped_band_lists(band_keys(sig)))
        .select("da", "db")
        .distinct()
    )
    comp = connected_components(pairs, src="da", dst="db")
    drop = comp.filter(F.col("component") != F.col("v")).select(
        F.col("v").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")


def prepare_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    eval_sets: list[DataFrame] | None = None,
    config: CorpusConfig | None = None,
    text: str = "text",
    id_col: str = "doc_id",
    dsir_target: DataFrame | None = None,
) -> dict:
    """Run the full preparation pipeline; write packed shards under
    ``out_dir/split=<name>/`` and return the accounting report.

    ``docs`` needs (id_col, text[, source]) — OR, for the
    CDC-maintained north-star table, (id_col, tokens) with NO text:
    every gate then runs over the TOKEN sequence (minhash shingles and
    decontamination n-grams hash token-id windows — the array paths
    those operators already define; exact dedup keys a double-seeded
    xxhash64 of the array), the word-based quality gate is skipped
    (reported as ``"skipped (no text column)"``), and eval sets must
    carry the same ``tokens`` column. If ``docs`` carries tokens, the
    tokenizer stage is skipped either way.

    Each counted stage is lazily checkpointed before its count, so
    the count materializes that stage ONCE and every later stage reads
    the materialized blocks — without this the per-stage counts would
    re-execute the whole upstream chain once per boundary (quadratic
    in stage count on a large corpus)."""
    cfg = config or CorpusConfig()
    cfg.validate_fim()
    report: dict = {"stages": {}, "splits": {}}
    has_text = text in docs.columns
    if not has_text and "tokens" not in docs.columns:
        raise ValueError(
            f"docs needs a {text!r} column or a pre-tokenized 'tokens' column"
        )
    # the unit sequence every content gate operates on: words (text)
    # or token ids (the north-star payload) — minhash/ngrams switch on
    # the column dtype, so downstream code is identical
    unit = text if has_text else "tokens"
    if cfg.dsir_frac is not None:
        # fail fast at the entry point (same stance as the eval-set
        # column check below)
        if not (0 < cfg.dsir_frac <= 1):
            raise ValueError(f"dsir_frac must be in (0, 1]: {cfg.dsir_frac}")
        if dsir_target is None:
            raise ValueError("dsir_frac needs a dsir_target corpus")
        if unit not in dsir_target.columns:
            raise ValueError(
                f"dsir_target lacks the {unit!r} column the corpus gates "
                f"run on (token-only corpora need token-typed targets)"
            )
    cur = docs
    report["stages"]["input"] = cur.count()

    if cfg.quality:
        if has_text:
            cur = filter_quality(
                cur, cfg.thresholds, text=text, id_col=id_col
            ).localCheckpoint(eager=False)
            report["stages"]["after_quality"] = cur.count()
        else:
            report["stages"]["after_quality"] = "skipped (no text column)"

    if cfg.max_ppl is not None:
        from .lmfilter import filter_by_perplexity, learn_bigram_lm

        lm = learn_bigram_lm(
            cur, text_col=unit, id_col=id_col, min_count=cfg.lm_min_count
        )
        if lm.vocab_size > 0:
            lm.persist()
            cur = filter_by_perplexity(
                cur, lm, cfg.max_ppl, text_col=unit, id_col=id_col
            ).localCheckpoint(eager=False)
            report["stages"]["after_perplexity"] = cur.count()
            report["lm_vocab"] = lm.vocab_size
            lm.unpersist()
        else:
            report["stages"]["after_perplexity"] = "skipped (empty corpus)"

    if cfg.exact_dedup:
        key = content_hash_expr(text if has_text else "tokens", has_text)
        keep = (
            cur.groupBy(key.alias("_h"))
            .agg(F.min(id_col).alias(id_col))
            .drop("_h")
        )
        cur = cur.join(keep, id_col, "left_semi").localCheckpoint(
            eager=False
        )
        report["stages"]["after_exact_dedup"] = cur.count()

    if cfg.near_dup:
        cur = near_dup_representatives(
            cur, text=unit, id_col=id_col
        ).localCheckpoint(eager=False)
        report["stages"]["after_near_dup"] = cur.count()

    if cfg.semantic_dedup:
        if "embedding" in cur.columns:
            from .semdedup import semdedup

            emb = cur.select(F.col(id_col).alias("vec_id"), "embedding")
            cts = (
                emb.orderBy("vec_id")
                .limit(cfg.semantic_cells)
                .select(
                    F.col("vec_id").alias("cell"),
                    F.col("embedding").alias("centroid"),
                )
            )
            keep = (
                semdedup(emb, tau=cfg.semantic_tau, cts=cts)
                .filter(F.col("keep"))
                .select(F.col("vec_id").alias(id_col))
            )
            cur = cur.join(keep, id_col, "left_semi").localCheckpoint(
                eager=False
            )
            report["stages"]["after_semantic_dedup"] = cur.count()
        else:
            report["stages"]["after_semantic_dedup"] = (
                "skipped (no embedding column)"
            )

    for ev in eval_sets or []:
        if unit not in ev.columns:
            # fail fast at the entry point (the deep alternative is an
            # unresolved-column AnalysisException mid-pipeline, after
            # the dedup stages already ran)
            raise ValueError(
                f"eval set lacks the {unit!r} column the corpus gates "
                f"run on (token-only corpora need token-typed eval sets)"
            )
        cur = decontaminate(
            cur,
            ev,
            n=cfg.decontaminate_ngram,
            min_hits=cfg.decontaminate_min_hits,
            text=unit,
            id_col=id_col,
        )
    if eval_sets:
        cur = cur.localCheckpoint(eager=False)
        report["stages"]["after_decontamination"] = cur.count()

    if cfg.dsir_frac is not None:
        from .dsir import learn_dsir, resample_dsir

        pool = cur.count()
        k = max(1, int(round(cfg.dsir_frac * pool)))
        model = learn_dsir(
            dsir_target,
            cur,
            text_col=unit,
            id_col=id_col,
            n_buckets=cfg.dsir_buckets,
            k_grams=tuple(cfg.dsir_grams),
            alpha=cfg.dsir_alpha,
        )
        cur = (
            resample_dsir(
                cur, model, k, seed=cfg.seed, text_col=unit, id_col=id_col
            )
            .drop("log_w")
            .localCheckpoint(eager=False)
        )
        report["stages"]["after_dsir"] = cur.count()
        report["dsir"] = {"pool": pool, "k": k, "n_buckets": cfg.dsir_buckets}

    cur = assign_split(cur, cfg.splits, key=id_col, seed=cfg.seed)
    if "tokens" not in cur.columns:
        merges = cfg.bpe_merges
        if merges is None and cfg.bpe_learn_merges > 0:
            # learn AFTER dedup/decontamination: merge statistics come
            # from the corpus that will actually be encoded
            from .bpe import learn_bpe

            merges = learn_bpe(
                cur, cfg.bpe_learn_merges, text=text, max_words=cfg.bpe_max_words
            )
            report["bpe_merges_learned"] = len(merges)
        if merges:
            from .bpe import bpe_encode

            cur = bpe_encode(cur, merges, text=text)
        else:
            cur = hash_tokenize(cur, text=text, vocab_size=cfg.vocab_size)
    cur = cfg.apply_fim(cur, id_col)
    cur = cur.localCheckpoint(eager=False)  # feeds one pack per split

    for name in sorted(cfg.splits):
        part = cur.filter(F.col("split") == name).select(id_col, "tokens")
        packed = pack_sequences(
            part,
            seq_len=cfg.seq_len,
            eos_id=cfg.eos_id,
            pad_id=cfg.pad_id,
            id_col=id_col,
        )
        dest = os.path.join(out_dir, f"split={name}")
        packed.write.mode("overwrite").parquet(dest)
        out = spark.read.parquet(dest)
        row = out.agg(
            F.count("*").alias("n_packs"),
            F.sum("n_real").alias("real_tokens"),
            F.sum(F.size(F.col("docs"))).alias("doc_slots"),
        ).collect()[0]
        report["splits"][name] = {
            "n_packs": int(row["n_packs"] or 0),
            "real_tokens": int(row["real_tokens"] or 0),
            "doc_slots": int(row["doc_slots"] or 0),
            "path": dest,
        }
    report["seq_len"] = cfg.seq_len
    return report
