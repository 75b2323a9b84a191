"""Vocabulary remapping for tokenized sequences (tokenizer migration).

When the tokenizer changes (vocab pruned, merged, re-ordered), every
``tokens: array<int>`` row must be rewritten under an old-id -> new-id
map — at corpus scale a full-table pass whose only acceptable plan is
map-only. Two execution paths, both zero-shuffle per row:

* dense path (default): the map is materialized as ONE array literal
  of length ``max_old_id + 1`` broadcast inside the plan; each token
  is ``array[old_id]`` via a higher-order ``transform`` — pure JVM,
  whole-stage codegen, no join, no Python. Right whenever old ids are
  bounded (vocabs are: 32k-256k), the literal is a few hundred KB in
  the serialized plan.
* join path (``remap_tokens_join``): for maps too large or sparse to
  inline — posexplode (map-only) -> broadcast-hash join against the
  mapping frame -> one groupBy reassembly shuffle. O(total tokens)
  through one exchange; use only when the dense literal is genuinely
  infeasible.

OOV policy (old ids absent from the map): ``unk`` substitutes
``unk_id``; ``drop`` removes the token (``n_tok`` recomputed);
``flag`` keeps rows intact and adds ``has_oov`` so the caller can
quarantine whole documents (the engine's reject-don't-crash stance).

Composes with :meth:`LakeTable.rewrite_payload` for the in-place
corpus migration: ``table.rewrite_payload(remap_exprs(mapping))`` is
scan + map + write with zero shuffles.

Reference anchor: type-coercion/allowed-value checks are the
reference's closest per-value mapping semantics
(cerberus_data_validation.py:38-40); this is the training-data-domain
bulk transform the north star's tokenized payload implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UNK_ID = 0


def _dense_lut(mapping: dict[int, int]) -> list:
    """mapping -> dense lookup list (index = old id, value = new id,
    None = OOV)."""
    if not mapping:
        raise ValueError("empty mapping")
    if min(mapping) < 0:
        raise ValueError("token ids must be non-negative")
    lut: list = [None] * (max(mapping) + 1)
    for old, new in mapping.items():
        lut[old] = new
    return lut


def remap_exprs(
    mapping: dict[int, int],
    token_col: str = "tokens",
    n_tok_col: str | None = "n_tok",
    oov: str = "unk",
    unk_id: int = UNK_ID,
) -> dict:
    """Column exprs applying the dense remap — feed them to
    ``withColumns`` or ``LakeTable.rewrite_payload``. ``oov`` is
    ``unk`` or ``drop`` (``flag`` needs an extra output column — use
    :func:`remap_tokens`)."""
    lut = F.lit(_dense_lut(mapping))
    # try_element_at: out-of-range old ids are OOV (NULL), never an
    # ANSI index error; negative ids guarded explicitly (index 0/-k
    # would wrap or raise)
    look = lambda t: F.when(t >= 0, F.try_element_at(lut, t + 1))  # noqa: E731
    if oov == "unk":
        toks = F.transform(token_col, lambda t: F.coalesce(look(t), F.lit(unk_id)))
    elif oov == "drop":
        toks = F.filter(
            F.transform(token_col, look), lambda x: x.isNotNull()
        )
    else:
        raise ValueError(f"oov policy {oov!r} (expected unk|drop)")
    out = {token_col: toks}
    if n_tok_col:
        out[n_tok_col] = F.size(toks).cast("int")
    return out


def remap_tokens(
    df: DataFrame,
    mapping: dict[int, int],
    token_col: str = "tokens",
    n_tok_col: str | None = "n_tok",
    oov: str = "unk",
    unk_id: int = UNK_ID,
) -> DataFrame:
    """Dense map-only remap of ``df``; see module docstring. With
    ``oov='flag'`` the tokens are remapped with ``unk_id`` AND a
    ``has_oov`` boolean is added (quarantine the trues upstream)."""
    if oov == "flag":
        lut = F.lit(_dense_lut(mapping))
        has_oov = F.exists(
            F.col(token_col),
            lambda t: F.when(t >= 0, F.try_element_at(lut, t + 1)).isNull(),
        )
        df = df.withColumn("has_oov", has_oov)
        oov = "unk"
    return df.withColumns(
        remap_exprs(mapping, token_col, n_tok_col, oov, unk_id)
    )


def remap_tokens_join(
    df: DataFrame,
    mapping: DataFrame,
    token_col: str = "tokens",
    n_tok_col: str | None = "n_tok",
    oov: str = "unk",
    unk_id: int = UNK_ID,
) -> DataFrame:
    """Join-path remap for maps too large to inline: ``mapping`` is a
    DataFrame ``(old_id int, new_id int)``. posexplode -> broadcast
    join -> groupBy reassembly (ONE shuffle of (doc, pos, id) rows).
    Only ``unk``/``drop`` policies. Rows are regrouped on every
    non-token column, so the frame needs a unique key column (the
    table's merge key). Empty/NULL token arrays come back empty."""
    if oov not in ("unk", "drop"):
        raise ValueError(f"oov policy {oov!r} (expected unk|drop)")
    other = [c for c in df.columns if c != token_col]
    exploded = df.select(
        *other, F.posexplode_outer(token_col).alias("_pos", "_old")
    ).join(F.broadcast(mapping), F.col("_old") == mapping["old_id"], "left")
    new = F.col("new_id") if oov == "drop" else F.coalesce("new_id", F.lit(unk_id))
    rebuilt = (
        exploded.groupBy(*other)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_pos").isNotNull() & new.isNotNull(),
                        F.struct(F.col("_pos"), new.cast("int").alias("_t")),
                    )
                )
            ).alias("_ps")
        )
        .withColumn(token_col, F.transform("_ps", lambda s: s["_t"]))
        .drop("_ps")
    )
    if n_tok_col:
        rebuilt = rebuilt.withColumn(
            n_tok_col, F.size(token_col).cast("int")
        )
    return rebuilt.select(*df.columns)
