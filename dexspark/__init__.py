"""dexspark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
CDCgov/data-exchange-validation-csv (an event-driven file-ingest +
CSV-validation pipeline) as an idiomatic Spark engine:

    readStream(change-event log)
      -> foreachBatch( parse -> validate -> quarantine-split
                       -> per-key last-writer-wins dedup
                       -> schema reconcile -> MERGE into lake table
                       -> lineage + epoch marker )

The payload is a table of pre-tokenized training sequences
(doc_id string, tokens array<int>, n_tok int, source string); the
reference's CSV row/file validation rules (required fields,
conditionally-required groups, allowed-value lists, column-count,
regex, max-field-length — see SURVEY.md §2.3) become vectorized
per-micro-batch checks compiled to Column expressions and Arrow-batched
``mapInPandas`` validators (never per-row Python).

Modules
-------
config    rule-set / engine configuration (codeless, hot-swappable —
          mirrors reference proof-of-concept/README.md:9-12)
schema    canonical schemas + additive evolution / int-widening reconciler
events    change-event envelope parsing (raw+parsed duality)
validate  rule compiler: config -> fail_reasons column / mapInPandas
dedup     per-key last-writer-wins (window + skew-proof aggregate forms)
lake      bucketed copy-on-write table with atomic snapshot commits,
          idempotent epoch markers, MERGE upsert (Iceberg-shaped API)
lineage   per-batch per-source lineage metrics + quarantine sink
stream    Structured Streaming driver (foreachBatch pipeline)
gen       deterministic synthetic base-table + binlog generator
oracle    single-threaded pandas replay oracle for equality testing
csv_ingest CSV file validation (the reference's home domain):
          parse-integrity, header checks, row rules, quarantine;
          ingest_archives composes decompress -> per-CSV validation
rulesets  shipped codeless rule-set artifacts (COVID-ELR V2020-07-30)
listing   recursive listing classification (the HTTP entry point)
queries   the driver-contract operator query surface + DuckDB oracles
operators multimodal payload plumbing; recursive archive fan-out +
          entry materialization; deterministic zip test corpus
"""

__version__ = "0.1.0"
