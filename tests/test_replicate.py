"""Invariants of the ×N fixture replicator: replica worlds must be
disjoint on every entity key AND internally joinable — a shift that
breaks either silently turns the x10 DAG bench into a no-op (rows
drop at the first join instead of flowing through the warehouse).
Pure-Python checks over the row generators (no Spark needed)."""

from __future__ import annotations

from dbt_tpcdi_spark.tpcdi import replicate as R


def _world(rep: int):
    delim = R._shift_delimited(rep)
    fin = {rt: recs for rt, _layout, recs in R._shift_finwire(rep)}
    actions = R._shift_actions(rep)
    return delim, fin, actions


def test_replicas_are_key_disjoint():
    seen_t, seen_ca, seen_c, seen_sym = set(), set(), set(), set()
    for rep in range(3):
        delim, fin, actions = _world(rep)
        t_ids = {r[0] for r in delim["trade"]}
        ca_ids = {a["ca_id"] for _, _, _, a in actions if a}
        c_ids = {c["c_id"] for _, _, c, _ in actions if c and "c_id" in c}
        syms = {f["symbol"] for _, f in fin["SEC"]}
        assert not (t_ids & seen_t) and not (ca_ids & seen_ca)
        assert not (c_ids & seen_c) and not (syms & seen_sym)
        seen_t |= t_ids
        seen_ca |= ca_ids
        seen_c |= c_ids
        seen_sym |= syms


def test_replica_worlds_are_internally_joinable():
    for rep in range(3):
        delim, fin, actions = _world(rep)
        t_ids = {r[0] for r in delim["trade"]}
        ca_ids = {a["ca_id"] for _, _, _, a in actions if a}
        sec_syms = {f["symbol"] for _, f in fin["SEC"]}
        # trade → account, security
        assert {r[8] for r in delim["trade"]} <= ca_ids
        assert {r[5] for r in delim["trade"]} <= sec_syms
        # history/holdings → trade
        assert {r[0] for r in delim["trade_history"]} <= t_ids
        assert {r[0] for r in delim["holding_history"]} <= t_ids
        assert {r[1] for r in delim["holding_history"]} <= t_ids
        # cash → account
        assert {r[0] for r in delim["cash_transaction"]} <= ca_ids
        # daily market → security
        assert {r[1] for r in delim["daily_market"]} <= sec_syms
        # SEC/FIN company links resolve to a shifted CMP cik or name
        ciks = {f["cik"].lstrip("0") for _, f in fin["CMP"]}
        names = {f["company_name"] for _, f in fin["CMP"]}
        for recs in (fin["SEC"], fin["FIN"]):
            for _, f in recs:
                by = f["co_name_or_cik"]
                assert by.lstrip("0") in ciks or by in names, (rep, by)


def test_symbols_fit_finwire_field_width():
    # SEC layout symbol field is fixed-width; a suffix overflow would
    # silently truncate and break the join instead of erroring
    from dbt_tpcdi_spark.sources.finwire import SEC_LAYOUT

    width = {f.name: f.length for f in SEC_LAYOUT}["symbol"]
    for rep in (0, 9):
        _rt, _layout, sec_recs = R._shift_finwire(rep)[1]
        for _pts, f in sec_recs:
            assert len(f["symbol"]) <= width


def test_x3_build_passes_warehouse_checks(spark, tmp_path):
    # end-to-end: a key-shifted x3 tree must build the full DAG with
    # every generic warehouse check green (unique surrogate keys,
    # referential integrity, accepted values) — proof the replicas
    # are disjoint AND joinable through all 45 models, not just at
    # the raw layer
    from dbt_tpcdi_spark.plans.runner import Runner
    from dbt_tpcdi_spark.plans.sources import load_dag_sources
    from dbt_tpcdi_spark.plans.validators import run_checks
    from dbt_tpcdi_spark.tpcdi.replicate import replicate_raw

    raw = replicate_raw(tmp_path / "x3", copies=3)
    built = Runner(
        spark, load_dag_sources(spark, str(raw)),
        warehouse_dir=str(tmp_path / "wh"),
    ).run(parallelism=4)
    assert len(built) == 45
    # entity volume scaled exactly 3x vs the single-world fixture
    assert built["fact_trade"].count() == 3 * 6
    failures = [(n, v) for n, v in run_checks(built.__getitem__) if v]
    assert not failures, failures
