"""Physical-plan audit: capture the executed plans of the engine's hot paths
and assert/record their scale-critical properties -> BENCH/PLANS.md.

The properties the 100 TB design depends on (each listed with the plan
excerpt that proves it):

* term/search scan: term predicate in PushedFilters, pos_blob pruned for
  non-phrase queries, no kind=doc read;
* prefix scan: the rewritten RANGE predicate pushed (no driver expansion);
* global top-k: TakeOrderedAndProject (per-partition top-k + driver merge),
  never a global Sort+Exchange;
* build: ONE range exchange feeding both the count and the invert action
  (InMemoryRelation reuse), mapInArrow for the kernel;
* incremental append stats: seg-range filter pushed (file pruning);
* relational distributed_topk: no Window without PARTITION BY anywhere;
* shingling: per-doc array expressions — zero Exchange/Join (the r2 form
  tripled the heaviest dedup shuffle with n-1 token self-joins).

Run: python plan_audit.py   (uses the memoized sf0.001 index)
"""

from __future__ import annotations

import re
from pathlib import Path


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _excerpt(plan: str, needles: list[str], ctx: int = 0) -> list[str]:
    out = []
    for line in plan.splitlines():
        if any(n in line for n in needles):
            out.append(line.strip()[:240])
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m
    from voyagr_spark.search import search, search_many

    idx = m._engine_index(spark, "/root/testdata/sf0.001")
    idx.unpin()  # sections 1-6 audit the cold parquet path; 8 re-pins

    sections: list[tuple[str, list[str], list[str]]] = []

    # 1. term search
    p = _plan(search(idx, "batch AND dup", k=10))
    checks = []
    checks.append(("term IN pushed to parquet",
                   any("PushedFilters" in l and "term" in l for l in p.splitlines())))
    checks.append(("pos_blob pruned (non-phrase)",
                   all("pos_blob" not in l for l in p.splitlines() if "ReadSchema" in l)))
    checks.append(("no kind=doc scan", "kind=doc" not in p))
    checks.append(("TakeOrderedAndProject global merge", "TakeOrderedAndProject" in p))
    sections.append(("AND search (batch AND dup)",
                     _excerpt(p, ["PushedFilters", "TakeOrderedAndProject"]),
                     [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in checks]))

    # 2. prefix search — executor-side range predicate
    p = _plan(search(idx, "vec*", k=10))
    ok = any("GreaterThanOrEqual(term" in l and "LessThan(term" in l
             for l in p.splitlines() if "PushedFilters" in l)
    sections.append(("prefix search (vec*)",
                     _excerpt(p, ["PushedFilters"]),
                     [f"{'PASS' if ok else 'FAIL'}: range predicate pushed, no driver expansion"]))

    # 3. phrase search — pos_blob read only here
    p = _plan(search(idx, '"fast key"', k=10))
    ok = any("pos_blob" in l for l in p.splitlines() if "ReadSchema" in l)
    sections.append(("phrase search (\"fast key\")",
                     _excerpt(p, ["ReadSchema"]),
                     [f"{'PASS' if ok else 'FAIL'}: pos_blob read for phrase only"]))

    # 4. batched queries — one scan for the union of terms
    p = _plan(search_many(idx, {"a": "batch", "b": "dup OR fast"}, k=10))
    nscans = p.count("Scan parquet")
    sections.append(("search_many (2 queries, one job)",
                     _excerpt(p, ["PushedFilters"]),
                     [f"{'PASS' if nscans == 1 else 'FAIL'}: single posting scan "
                      f"({nscans} Scan parquet nodes)"]))

    # 5. no partition-less Window in the ANN/topk relational paths
    from voyagr_spark import relational as R

    p = _plan(R.ann_topk(spark, "/root/testdata/sf0.001", 0, 10))
    bad = [l.strip()[:200] for l in p.splitlines()
           if "Window" in l and "PartitionBy" not in l and "windowspecdefinition" in l.lower()]
    # the only window left runs over the already-limited k rows
    glob = [l for l in p.splitlines() if "GlobalLimit" in l or "TakeOrderedAndProject" in l]
    sections.append(("relational ann_topk",
                     [*(l.strip()[:200] for l in glob)],
                     [f"{'PASS' if glob else 'FAIL'}: local top-k + k-row global merge; "
                      f"rank window input is the limited k rows"]))

    # 6. incremental append stats: seg range pushed
    from voyagr_spark.streaming import new_segment_postings

    p = _plan(new_segment_postings(idx, 1 << 50, (1 << 50) + 10))
    ok = any("GreaterThanOrEqual(seg" in l and "LessThan(seg" in l
             for l in p.splitlines() if "PushedFilters" in l)
    sections.append(("append incremental stats scan",
                     _excerpt(p, ["PushedFilters"]),
                     [f"{'PASS' if ok else 'FAIL'}: seg-range predicate pushed "
                      "(parquet footer file pruning -> O(batch) input)"]))

    # 7. shingles: per-doc array expressions, not token-table self-joins
    # (VERDICT r2 #3) — the whole signature computes inside the scan
    # projection: zero Exchange, zero Join
    p = _plan(R.shingle_minhash(spark, "/root/testdata/sf0.001", 3, 4))
    n_exch = p.count("Exchange")
    n_join = p.count("Join")
    sections.append((
        "shingle_minhash (word 3-grams -> 4-band MinHash)",
        _excerpt(p, ["Exchange", "Join", "Scan parquet", "ArrowEval"]),
        [f"{'PASS' if n_exch == 0 else 'FAIL'}: zero shuffles "
         f"({n_exch} Exchange nodes; was n-1 token self-joins in r2)",
         f"{'PASS' if n_join == 0 else 'FAIL'}: zero joins ({n_join} Join nodes)"],
    ))

    # 8. pinned searcher (serving mode): zero exchange per query — the
    # postings cache is hash-partitioned by seg at pin time, so the
    # per-query plan is Filter -> InMemoryTableScan -> FlatMapGroupsInPandas
    # -> TakeOrderedAndProject in ONE stage (Index.pin docstring)
    idx.pin()
    try:
        df = search(idx, "batch AND dup", k=10)
        df.collect()  # AQE final plan
        p = _plan(df)
        final = p.split("== Initial Plan ==")[0]
        above = final.split("InMemoryRelation")[0]
        checks = [
            ("zero per-query Exchange (pin-time shuffle only)",
             "Exchange" not in above),
            ("serves from InMemoryTableScan", "InMemoryTableScan" in final),
            ("term predicate prunes cached batches",
             any("InMemoryTableScan" in l and "term" in l
                 for l in final.splitlines())),
            ("TakeOrderedAndProject global merge",
             "TakeOrderedAndProject" in final),
        ]
        # columnar serving fast path: eligible term/AND/OR queries answer
        # from the decoded (seg, term, doc_id, tf, norm, ntv, pos) cache
        # with NO Python stage at all (search._columnar_topk); exact
        # phrases too (search._columnar_phrase_topk — phraseFreq as a JVM
        # array expression); sloppy phrases keep the Pandas scorer shape
        checks.append((
            "columnar fast path: AND query has NO Python stage per query",
            "Pandas" not in above and "Python" not in above,
        ))
        dfp = search(idx, '"fast key"', k=10)
        dfp.collect()
        pph = _plan(dfp).split("== Initial Plan ==")[0]
        pph_above = pph.split("InMemoryRelation")[0]
        checks.append((
            "exact phrase is columnar too (no Python stage per query)",
            "Pandas" not in pph_above and "Python" not in pph_above,
        ))
        dfs = search(idx, '"fast key"~2', k=10)
        dfs.collect()
        psl = _plan(dfs).split("== Initial Plan ==")[0]
        checks.append((
            "sloppy phrase still serves via the Pandas scorer",
            "FlatMapGroupsInPandas" in psl,
        ))
        for label, qq in (("MUST+SHOULD mix", "+batch dup"),
                          ("prefix rewrite", "bat*")):
            dmx = search(idx, qq, k=10)
            dmx.collect()
            pmx = _plan(dmx).split("== Initial Plan ==")[0]
            pmx_above = pmx.split("InMemoryRelation")[0]
            checks.append((
                f"{label} is columnar too (no Python stage per query)",
                "Pandas" not in pmx_above and "Python" not in pmx_above,
            ))
        # r4 widened eligibility: msm-bearing MUST+SHOULD mixes and the
        # full match-set scores() surface (the /select fq flow) are
        # columnar too
        from voyagr_spark.parser import MUST, SHOULD, BooleanQuery, TermQuery
        from voyagr_spark.search import scores as _scores

        qmm = BooleanQuery(
            clauses=((MUST, TermQuery("batch")), (SHOULD, TermQuery("dup")),
                     (SHOULD, TermQuery("fast"))),
            min_should_match=1,
        )
        dmm = search(idx, qmm, k=10)
        dmm.collect()
        pmm = _plan(dmm).split("== Initial Plan ==")[0]
        pmm_above = pmm.split("InMemoryRelation")[0]
        checks.append((
            "MUST+SHOULD with msm>0 is columnar (no Python stage)",
            "Pandas" not in pmm_above and "Python" not in pmm_above,
        ))
        dsc = _scores(idx, "batch AND dup")
        dsc.collect()
        psc = _plan(dsc).split("== Initial Plan ==")[0]
        psc_above = psc.split("InMemoryRelation")[0]
        checks.append((
            "scores() full match set (the /select fq flow) is columnar: "
            "no Python stage, zero per-query Exchange",
            "Pandas" not in psc_above and "Python" not in psc_above
            and "Exchange" not in psc_above,
        ))
        dfb = search_many(
            idx, {"a": "batch", "b": "dup OR fast", "c": '"fast key"'},
            k=10, columnar=True,
        )
        dfb.collect()
        pb = _plan(dfb).split("== Initial Plan ==")[0]
        pb_above = pb.split("InMemoryRelation")[0]
        checks.append((
            "all-eligible batch (incl. exact phrase) is one Python-free "
            "plan",
            "Pandas" not in pb_above and "Python" not in pb_above,
        ))
        sections.append((
            "pinned searcher (serving mode, batch AND dup)",
            _excerpt(above, ["Exchange", "InMemoryTableScan",
                             "TakeOrderedAndProject", "HashAggregate"]),
            [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in checks],
        ))
    finally:
        idx.unpin()

    # 9b. chunk_documents: split -> sequence -> posexplode -> slice, all
    # JVM-side per doc — zero shuffles, zero Python
    p = _plan(R.chunk_documents(spark, "/root/testdata/sf0.001", 64, 48))
    ck_checks = [
        ("zero shuffles (per-doc array expression)", "Exchange" not in p),
        ("zero Python (built-in split/slice/md5)",
         "EvalPython" not in p and "ArrowEval" not in p),
    ]
    sections.append((
        "chunk_documents (64-token windows, stride 48)",
        _excerpt(p, ["Generate", "Scan parquet"]),
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in ck_checks],
    ))

    # 9. spatial distance query: circle->bbox prefilter + exact haversine
    # verify — every expression native Catalyst (zero Python, zero shuffle)
    from voyagr_spark import spatial as SPA

    p = _plan(
        SPA.distance_search(spark, "/root/testdata/sf0.001", 12.0, -30.0,
                            3000.0)
    )
    sp_checks = [
        ("no Python evaluation (trig verify is JVM-side)",
         "EvalPython" not in p and "ArrowEval" not in p),
        ("zero shuffles (scan -> filter -> project)", "Exchange" not in p),
    ]
    sections.append((
        "spatial distance query (bbox prefilter + haversine verify)",
        _excerpt(p, ["Filter", "Scan parquet"]),
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in sp_checks],
    ))

    # 10. early-terminating sorted collector: on an index_sort index the
    # by-field cut happens on posting doc ids alone — no kind=doc scan
    # before the cut, no scores, TakeOrderedAndProject over per-segment
    # first-k rows (TopFieldCollector.canEarlyTerminate analog)
    from voyagr_spark.search import matches_first_by_docid

    sidx = m._engine_sorted_index(spark, "/root/testdata/sf0.001")
    sidx.unpin()
    try:
        p = _plan(matches_first_by_docid(sidx, "batch AND dup", 10))
        et_checks = [
            ("term IN pushed to parquet",
             any("PushedFilters" in l and "term" in l
                 for l in p.splitlines())),
            ("no kind=doc scan before the cut", "kind=doc" not in p),
            ("TakeOrderedAndProject over per-segment first-k",
             "TakeOrderedAndProject" in p),
        ]
        sections.append((
            "early-terminating sorted collector (index_sort, by-field top-k)",
            _excerpt(p, ["PushedFilters", "TakeOrderedAndProject"]),
            [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in et_checks],
        ))
    finally:
        sidx.pin()

    # 11. ParallelStream: the worker fan-out is ONE declared hash shuffle;
    # the downstream unique's window reuses it (no second hashpartitioning)
    from voyagr_spark import tuplestream as ts

    s = ts.TStream(idx.docmap().select("doc_id", "lang"),
                   (("lang", True), ("doc_id", True)))
    p = _plan(ts.unique(ts.parallel(s, 3, ["lang"]), ["lang"]).df)
    n_hash = p.count("hashpartitioning")
    sections.append((
        "TupleStream parallel -> unique (worker shuffle reuse)",
        _excerpt(p, ["Exchange", "Window"]),
        [f"{'PASS' if n_hash == 1 else 'FAIL'}: one hashpartitioning total "
         f"({n_hash}) — the unique window reuses the parallel repartition"],
    ))

    # 12. facet.heatmap: one aggregation exchange total (scan -> partial
    # agg -> #cells-sized shuffle), no join, no Python
    from voyagr_spark import spatial as sp  # noqa: F811

    p = _plan(sp.heatmap_facet(spark, "/root/testdata/sf0.001",
                           -33.75, 33.75, -90.0, 90.0, 4))
    hm_checks = [
        ("partial aggregation before the exchange",
         "partial_count" in p or "HashAggregate" in p),
        ("no join", "Join" not in p),
        ("no Python in the row path",
         "Python" not in p and "InPandas" not in p),
    ]
    sections.append((
        "facet.heatmap (grid counts)",
        _excerpt(p, ["HashAggregate", "Exchange"]),
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in hm_checks],
    ))

    # 13. DIH delta-import: the stamp predicate reaches the source scan
    # (PushedFilters), transformers are one whole-stage projection
    import __spark_entry__ as entrymod

    p = _plan(entrymod.queries()["dih_delta"](
        spark, "/root/testdata/sf0.001"))
    dih_checks = [
        ("delta stamp predicate pushed to the source scan",
         any("PushedFilters" in l and "o_orderdate" in l
             for l in p.splitlines())),
        ("no shuffle (scan -> filter -> transformer project)",
         "Exchange" not in p),
        ("no Python in the row path",
         "Python" not in p and "InPandas" not in p),
    ]
    sections.append((
        "DIH delta-import (pushdown + codegen transformers)",
        _excerpt(p, ["PushedFilters", "Project"]),
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in dih_checks],
    ))

    # 14. Block join: child-hit aggregation shuffles once on the parent
    # key and the global parent top-k is a TakeOrderedAndProject
    p = _plan(entrymod.queries()["engine_block_join_total"](
        spark, "/root/testdata/sf0.001"))
    bj_checks = [
        ("global parent merge is TakeOrderedAndProject",
         "TakeOrderedAndProject" in p),
        ("term predicate pushed to the postings scan",
         any("PushedFilters" in l and "term" in l for l in p.splitlines())),
    ]
    sections.append((
        "block join (ToParent, Total mode)",
        _excerpt(p, ["TakeOrderedAndProject", "PushedFilters"]),
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in bj_checks],
    ))

    # 15. JSON facets: the whole nested spec is ONE plan; buckets rank
    # inside window partitions over already-aggregated (tiny) tables
    p = _plan(entrymod.queries()["json_facet"](
        spark, "/root/testdata/sf0.001"))
    jf_checks = [
        ("partial aggregation before every bucket shuffle",
         "partial_count" in p or "HashAggregate" in p),
        ("per-parent rank is a Window over the bucket table, not the corpus",
         "Window" in p),
        # every level re-aggregates the same domain: the match-set subtree
        # (the analysis UDF) is materialized ONCE behind an
        # InMemoryTableScan, so the tokenize pass runs once, not per level
        ("domain cached once — levels read InMemoryTableScan",
         "InMemoryTableScan" in p),
    ]
    sections.append((
        "JSON facets (nested 2-level spec, one plan)",
        _excerpt(p, ["HashAggregate", "Window"]),
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in jf_checks],
    ))

    # 16. PayloadScoreQuery: the term predicate reaches the postings scan
    # and the global merge is the k-row TakeOrderedAndProject
    p = _plan(entrymod.queries()["engine_payload_max"](
        spark, "/root/testdata/sf0.001"))
    pay_checks = [
        ("term predicate pushed to the postings scan",
         any("PushedFilters" in l and "term" in l for l in p.splitlines())),
        ("TakeOrderedAndProject global merge", "TakeOrderedAndProject" in p),
    ]
    sections.append((
        "payload scoring (span x max fold)",
        _excerpt(p, ["PushedFilters", "TakeOrderedAndProject"]),
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in pay_checks],
    ))

    # 17. LTR rerank: feature joins broadcast the reRankDocs window and the
    # model column is pure Catalyst (no Python beyond the scorers)
    p = _plan(entrymod.queries()["engine_ltr_trees"](
        spark, "/root/testdata/sf0.001"))
    ltr_checks = [
        ("feature joins broadcast the rerank window",
         "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p),
        ("model evaluates as a Catalyst CASE/WHEN column (no model UDF)",
         "CASE WHEN" in p),
    ]
    sections.append((
        "LTR rerank (trees model)",
        _excerpt(p, ["BroadcastHashJoin", "CASE WHEN"]),
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in ltr_checks],
    ))

    # 18. shard split routing: the SPLITSHARD analog must be ONE pass —
    # every posting row decodes once in a single Arrow stage and routes
    # executor-side; no shuffle happens before the partitioned write
    # (at 100 TB a routing Exchange would re-shuffle the whole index)
    from voyagr_spark import shards as sh

    p = _plan(sh.routed_rows(idx, 2))
    split_checks = [
        ("zero Exchange before the partitioned split write",
         "Exchange" not in p),
        ("posting rows route in one Arrow pass (MapInPandas)",
         "MapInPandas" in p),
        ("no driver-side collect in the routing plan",
         "CollectLimit" not in p),
    ]
    sections.append((
        "shard split routing (n=2, SolrIndexSplitter analog)",
        _excerpt(p, ["MapInPandas", "Union"]),
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in split_checks],
    ))

    # 19. sharded scatter-gather: the distributed-search merge must be a
    # k-row TakeOrdered cut over per-shard top-ks, never a global sort
    # exchange (ExactStatsCache semantics keep scores mergeable)
    import tempfile

    sd = tempfile.mkdtemp(prefix="plan_audit_shards_")
    shard_pair = sh.split_index(idx, [f"{sd}/s0", f"{sd}/s1"])
    p = _plan(sh.sharded_search(shard_pair, "fast OR key", k=10))
    gather_checks = [
        ("global gather is TakeOrderedAndProject over per-shard top-ks",
         "TakeOrderedAndProject" in p),
        ("no global sort exchange (rangepartitioning) in the gather",
         "rangepartitioning" not in p),
    ]
    sections.append((
        "sharded scatter-gather (2 shards)",
        _excerpt(p, ["TakeOrderedAndProject"]),
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in gather_checks],
    ))

    # 20. distributed component merges: the stats merge folds per-shard
    # 1-row partials (never re-shuffling the match sets into one node),
    # and the grouping merge's per-group fold runs over the tiny per-shard
    # group-head union, with partial aggregation below every exchange
    p = _plan(sh.sharded_stats_field(shard_pair, "fast", "nchars"))
    stats_checks = [
        ("per-shard stats are partial-aggregated before any exchange",
         "partial_count" in p and "partial_min" in p),
        ("no global sort in the stats merge", "rangepartitioning" not in p),
    ]
    pg = _plan(sh.sharded_group_top1(shard_pair, "fast", "lang"))
    group_checks = [
        ("per-shard group heads cut by a WindowGroupLimit before the merge",
         "WindowGroupLimit" in pg),
        ("no corpus-wide rangepartitioning in the grouping merge",
         "rangepartitioning" not in pg),
    ]
    sections.append((
        "distributed component merges (stats + grouping)",
        _excerpt(p, ["partial_min"]) + _excerpt(pg, ["WindowGroupLimit"]),
        [f"{'PASS' if ok else 'FAIL'}: {name}"
         for name, ok in stats_checks + group_checks],
    ))

    # 10. ninth-session surfaces: CommonGrams phrase collapse, the
    # FreeTextSuggester lookup, and the {!collapse} post-filter
    cg = m._engine_cg_index(spark, "/root/testdata/sf0.001")
    cg.unpin()
    pcg = _plan(search(cg, '"the batch"', k=10))
    cg_checks = [
        ("CG phrase reads NO positions (pos_blob pruned — the phrase "
         "collapsed to one gram TermQuery)",
         all("pos_blob" not in l for l in pcg.splitlines()
             if "ReadSchema" in l)),
        ("gram term predicate pushed to parquet",
         any("PushedFilters" in l and "term" in l
             for l in pcg.splitlines())),
    ]
    cg.pin()
    from voyagr_spark import relational as R

    pft = _plan(R.free_text_suggest(spark, "/root/testdata/sf0.001",
                                    "fast k", 10))
    ft_checks = [
        ("per-model top-N is TakeOrderedAndProject",
         "TakeOrderedAndProject" in pft),
        ("no corpus-wide rangepartitioning in the suggester",
         "rangepartitioning" not in pft),
    ]
    from voyagr_spark.solr_api import solr_select

    pcol = _plan(solr_select(idx, "batch", fq="{!collapse field=lang}",
                             rows=10))
    col_checks = [
        ("collapse window shuffles on the collapse key "
         "(hashpartitioning(lang)), never a global window",
         "hashpartitioning(lang" in pcol),
    ]
    sections.append((
        "ninth-session surfaces (CommonGrams / FreeText / collapse)",
        _excerpt(pcg, ["ReadSchema"]) + _excerpt(pcol, ["hashpartitioning(lang"]),
        [f"{'PASS' if ok else 'FAIL'}: {name}"
         for name, ok in cg_checks + ft_checks + col_checks],
    ))

    # 11. tenth-session surfaces: DSIR weights/sample and BPE token counts
    from voyagr_spark import bpe as _BPE

    pds = _plan(R.dsir_weights(spark, "/root/testdata/sf0.001"))
    pbp = _plan(_BPE.bpe_token_counts(spark, "/root/testdata/sf0.001", 10))
    dsir_checks = [
        ("DSIR llr model joins are BroadcastHashJoin (256-row models, "
         "never a corpus-sized shuffle join)",
         "BroadcastHashJoin" in pds),
        ("DSIR per-doc weight agg is partial (map-side combine before the "
         "doc_id exchange)", "partial_sum" in pds),
        ("DSIR features stay JVM-side past the split (no corpus-sized "
         "Python stage: ngrams are transform/sequence expressions)",
         "mapInPandas" not in pds and "ArrowEvalPython" not in pds
         and "BatchEvalPython" not in pds),
    ]
    bpe_checks = [
        ("BPE word->n_sub dictionary joins back via BroadcastHashJoin",
         "BroadcastHashJoin" in pbp),
        ("BPE doc-level sums are partial-aggregated", "partial_sum" in pbp),
        ("the only Python stage is the vocabulary-sized distinct-word "
         "encode (exactly one MapInPandas)",
         pbp.count("MapInPandas") == 1),
    ]
    sections.append((
        "tenth-session surfaces (DSIR / BPE)",
        _excerpt(pds, ["BroadcastHashJoin"])[:2]
        + _excerpt(pbp, ["MapInPandas"])[:1],
        [f"{'PASS' if ok else 'FAIL'}: {name}"
         for name, ok in dsir_checks + bpe_checks],
    ))

    # 12. Gopher curation rules: single-scan, zero-shuffle, zero-Python
    from voyagr_spark import curation as _CU

    prep = _plan(_CU.gopher_repetition(
        _CU.lined_documents(spark, "/root/testdata/sf0.001", 3, False)))
    pqual = _plan(_CU.gopher_quality(
        _CU.lined_documents(spark, "/root/testdata/sf0.001", 6, True)))
    cur_checks = [
        ("gopher_repetition is shuffle-free (no Exchange: every A1.2 "
         "signal is a per-doc array expression)", "Exchange" not in prep),
        ("gopher_repetition has no Python stage (higher-order JVM "
         "expressions only)",
         all(s not in prep for s in
             ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"))),
        ("gopher_repetition reads only (doc_id, text) from parquet",
         all(("ReadSchema" not in l) or
             ("doc_id" in l and "text" in l and "lang" not in l
              and "source" not in l and "n_chars" not in l)
             for l in prep.splitlines())),
        ("gopher_quality (lined) is shuffle-free", "Exchange" not in pqual),
        ("gopher_quality (lined) has no Python stage",
         all(s not in pqual for s in
             ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"))),
    ]
    sections.append((
        "Gopher curation rules (gopher_repetition / gopher_lined_quality)",
        _excerpt(prep, ["ReadSchema"])[:2],
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in cur_checks],
    ))

    # 12b. C4 filters + PII redaction: the same single-scan contract —
    # at 100 TB these run at parquet-read speed with no exchange
    pc4 = _plan(_CU.c4_filters_table(spark, "/root/testdata/sf0.001"))
    ppii = _plan(_CU.pii_redact_table(spark, "/root/testdata/sf0.001"))
    c4_checks = [
        ("c4_filters has no aggregate/join exchange (only the gate's "
         "presentation sort)", "hashpartitioning" not in pc4),
        ("c4_filters has no Python stage (regex + higher-order JVM "
         "expressions only)",
         all(s not in pc4 for s in
             ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"))),
        ("pii_redact has no aggregate/join exchange",
         "hashpartitioning" not in ppii),
        ("pii_redact has no Python stage",
         all(s not in ppii for s in
             ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"))),
        ("pii_redact reads only (doc_id, text) from parquet",
         all(("ReadSchema" not in l) or
             ("doc_id" in l and "text" in l and "lang" not in l)
             for l in ppii.splitlines())),
    ]
    sections.append((
        "C4 filters + PII redaction (c4_filters / pii_redact)",
        _excerpt(pc4, ["ReadSchema"])[:2],
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in c4_checks],
    ))

    # full StatsComponent: one partial-aggregated pass, no window, no
    # corpus-sized collect — stddev/calcdistinct derive from merged
    # partials (count_distinct two-phase agg is value-cardinality-bounded)
    from voyagr_spark import relational as _R

    pst = _plan(_R.stats_field(spark, "/root/testdata/sf0.001",
                               "batch", "n_chars", full=True))
    st_checks = [
        ("stats_full aggregates are partial (map-side combine)",
         "partial" in pst.lower()),
        ("stats_full has no Window", "Window" not in pst),
        ("stats_full's only Python stage is the Arrow tokenize pass",
         sum(pst.count(k) for k in ("MapInPandas", "ArrowEvalPython",
                                    "BatchEvalPython",
                                    "FlatMapGroupsInPandas")) == 1),
    ]
    sections.append((
        "full StatsComponent (stats_full)",
        _excerpt(pst, ["HashAggregate"])[:2],
        [f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok in st_checks],
    ))

    md = ["# BENCH/PLANS.md — executed-plan audit of the hot paths",
          "",
          "Generated by `python plan_audit.py` (plans captured from the real",
          "engine on the sf0.001 index; PASS lines are asserted properties).",
          ""]
    failed = False
    for title, excerpt, checks in sections:
        md.append(f"## {title}")
        md.append("")
        for c in checks:
            md.append(f"- {c}")
            failed |= c.startswith("FAIL")
        if excerpt:
            md.append("")
            md.append("```")
            md.extend(excerpt[:6])
            md.append("```")
        md.append("")
    Path("BENCH").mkdir(exist_ok=True)
    Path("BENCH/PLANS.md").write_text("\n".join(md))
    print("\n".join(c for _, _, cs in sections for c in cs))
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
