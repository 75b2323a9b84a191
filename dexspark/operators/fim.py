"""Fill-in-the-middle (FIM) transformation for training sequences.

The standard code/infilling pre-training transform (Bavarian et al.
2022, "Efficient Training of Language Models to Fill in the Middle"):
a fraction of documents is rewritten from ``tokens`` into

    PSM:  [PRE] prefix [SUF] suffix [MID] middle
    SPM:  [PRE] [SUF] suffix [MID] prefix middle

where (prefix, middle, suffix) is a random 3-way split of the
document. Applied at the data-pipeline level (before packing), as the
paper recommends, so the model sees a ``rate`` mix of FIM and plain
documents.

Scale shape: everything is a pure JVM expression inside whole-stage
codegen — no shuffle, no Python. Randomness is DETERMINISTIC, derived
from ``xxhash64`` of (seed, doc_id): the transform is reproducible
across runs/engines and stable under re-partitioning, the same
hash-fraction primitive as ``sampling.assign_split`` — and therefore
exactly replayable by the incremental corpus pipeline.

Token conservation: the multiset of non-sentinel tokens is exactly
the input document's tokens (the three slices partition the array).

Reference anchor: the reference transforms records row-wise against
deterministic config (fns-csv-pipeline row validation); this is the
training-domain analogue of a per-row rewrite stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _hash_unit(tag: str, seed: int, id_col: str) -> Column:
    """Deterministic uniform-ish value in [0, 1) from (tag, seed, id).

    Single-string ``xxhash64`` so the Python mirror
    (``dexspark.xxh64.xxhash64``) reproduces it bit-for-bit for
    oracle tests."""
    h = F.xxhash64(
        F.concat_ws(":", F.lit(tag), F.lit(str(seed)), F.col(id_col))
    )
    return F.pmod(h, F.lit(1_000_000)).cast("double") / 1_000_000.0


def _cut(tag: str, seed: int, id_col: str, n: Column) -> Column:
    """Deterministic cut point in [0, n] (inclusive)."""
    h = F.xxhash64(
        F.concat_ws(":", F.lit(tag), F.lit(str(seed)), F.col(id_col))
    )
    return F.pmod(h, (n + F.lit(1)).cast("bigint")).cast("int")


def fim_transform(
    df: DataFrame,
    pre_id: int,
    mid_id: int,
    suf_id: int,
    rate: float = 0.5,
    seed: int = 0,
    mode: str = "psm",
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rewrite ``rate`` of documents into FIM order; adds a boolean
    ``fim_applied`` column. Empty/NULL documents pass through.

    ``mode``: ``"psm"`` (prefix-suffix-middle, the default) or
    ``"spm"`` (the joint suffix-prefix-middle variant). Sentinel ids
    should live outside the content vocabulary (e.g. the three ids
    right after the EOS/PAD block)."""
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be 'psm' or 'spm', got {mode!r}")
    toks = F.col(tokens_col)
    n = F.size(toks)
    gate = (
        (F.lit(float(rate)) > _hash_unit("fimgate", seed, id_col))
        & toks.isNotNull()
        & (n > 0)
    )
    c1 = _cut("fimcut1", seed, id_col, n)
    c2 = _cut("fimcut2", seed, id_col, n)
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    # 3-way partition: prefix = [1, lo], middle = (lo, hi], suffix = (hi, n]
    prefix = F.slice(toks, F.lit(1), lo)
    middle = F.slice(toks, lo + F.lit(1), hi - lo)
    suffix = F.slice(toks, hi + F.lit(1), n - hi)
    # sentinel singleton arrays, typed to the tokens' element type so
    # concat never needs an implicit array cast
    et = df.schema[tokens_col].dataType.elementType.simpleString()
    sent = lambda i: F.array(F.lit(int(i)).cast(et))  # noqa: E731
    if mode == "psm":
        fim = F.concat(
            sent(pre_id), prefix, sent(suf_id), suffix, sent(mid_id), middle
        )
    else:
        fim = F.concat(
            sent(pre_id), sent(suf_id), suffix, sent(mid_id), prefix, middle
        )
    return df.withColumn(
        tokens_col, F.when(gate, fim).otherwise(toks)
    ).withColumn("fim_applied", gate)
