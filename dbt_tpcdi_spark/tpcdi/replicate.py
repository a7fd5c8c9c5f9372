"""Key-shifted ×N replication of the TPC-DI fixture — a bigger scale
point for the full-DAG build benchmark.

The hand-authored fixture (``fixtures.generate``) is entity-coherent:
trades reference accounts, accounts reference customers, securities
reference companies, facts reference symbols. Replication must keep
that coherence or the DAG's joins silently drop the new rows and the
"×10 build" measures nothing. Each replica shifts every entity key by
a replica-specific offset — customers, accounts, trades numerically;
symbols and company names by suffix; CIKs re-padded — so replica r is
a disjoint, fully-joinable copy of the Batch1 world:

- ``c_id``/``ca_id`` + r·1000, ``t_id`` + r·100000 (also everywhere
  they appear as foreign keys: trade→account, cash→account,
  watch→customer, holding→trade, trade_history→trade);
- symbols ``AAA`` → ``AAA<r>`` (within the CHAR(15) FINWIRE field) in
  SEC records, trades, watch history, daily market;
- CIK + r·1000 (10-digit re-pad), company names suffixed `` R<r>``,
  and SEC/FIN ``co_name_or_cik`` shifted the same way on whichever
  form (numeric CIK or company name) the record uses;
- reference/dimension feeds (Date, TaxRate, StatusType, TradeType,
  Industry, HR, Prospect) are volume-invariant and written once.

Replica 0 is the untouched original, so the ×N tree strictly contains
the fixture world.
"""

from __future__ import annotations

import copy
from pathlib import Path

from dbt_tpcdi_spark.tpcdi import fixtures as FX

C_SHIFT = 1_000
CA_SHIFT = 1_000
T_SHIFT = 100_000
CIK_SHIFT = 1_000


def _sym(sym: str, rep: int) -> str:
    return sym if rep == 0 else f"{sym}{rep}"


def _cik(cik: str, rep: int) -> str:
    # "0000001001" (10-digit padded) or "1001" (short form) — shift
    # numerically, keep the original padding width
    return str(int(cik) + rep * CIK_SHIFT).zfill(len(cik))


def _by(co_name_or_cik: str, rep: int) -> str:
    """SEC/FIN link to the company: numeric CIK or company name."""
    if rep == 0:
        return co_name_or_cik
    if co_name_or_cik.isdigit():
        return _cik(co_name_or_cik, rep)
    return f"{co_name_or_cik} R{rep}"


def _shift_actions(rep: int, actions=None) -> list:
    out = []
    for verb, ts, cust, acct in (FX.ACTIONS if actions is None
                                 else actions):
        cust = copy.deepcopy(cust)
        if cust is not None and "c_id" in cust:
            cust["c_id"] += rep * C_SHIFT
        acct = copy.deepcopy(acct)
        if acct is not None and "ca_id" in acct:
            acct["ca_id"] += rep * CA_SHIFT
        out.append((verb, ts, cust, acct))
    return out


def _shift_finwire_records(rec_type: str, records: list,
                           rep: int) -> list:
    """Key-shift one FINWIRE record list by type (the same shifts
    ``_shift_finwire`` applies to the Batch1 sets)."""
    out = []
    for pts, f in records:
        f = dict(f)
        if rec_type == "CMP":
            f["cik"] = _cik(f["cik"], rep)
            if rep:
                f["company_name"] = f"{f['company_name']} R{rep}"
        elif rec_type == "SEC":
            f["symbol"] = _sym(f["symbol"], rep)
            f["co_name_or_cik"] = _by(f["co_name_or_cik"], rep)
        else:  # FIN
            f["co_name_or_cik"] = _by(f["co_name_or_cik"], rep)
        out.append((pts, f))
    return out


def _shift_finwire(rep: int) -> tuple:
    cmp_recs = []
    for pts, f in FX.CMP_RECORDS:
        f = dict(f)
        f["cik"] = _cik(f["cik"], rep)
        if rep:
            f["company_name"] = f"{f['company_name']} R{rep}"
        cmp_recs.append((pts, f))
    sec_recs = []
    for pts, f in FX.SEC_RECORDS:
        f = dict(f)
        f["symbol"] = _sym(f["symbol"], rep)
        f["co_name_or_cik"] = _by(f["co_name_or_cik"], rep)
        sec_recs.append((pts, f))
    fin_recs = []
    for pts, f in FX.FIN_RECORDS:
        f = dict(f)
        f["co_name_or_cik"] = _by(f["co_name_or_cik"], rep)
        fin_recs.append((pts, f))
    return (
        ("CMP", FX.CMP_LAYOUT, cmp_recs),
        ("SEC", FX.SEC_LAYOUT, sec_recs),
        ("FIN", FX.FIN_LAYOUT, fin_recs),
    )


def _shift_delimited(rep: int) -> dict[str, list]:
    dm = [
        (d, _sym(s, rep), *rest) for d, s, *rest in FX.daily_market_rows()
    ]
    watch = [
        (c + rep * C_SHIFT, _sym(s, rep), ts, a)
        for c, s, ts, a in FX.WATCH_HISTORY
    ]
    trade = [
        (t + rep * T_SHIFT, dts, st, tt, cash, _sym(sym, rep), qty, bid,
         ca + rep * CA_SHIFT, *rest)
        for t, dts, st, tt, cash, sym, qty, bid, ca, *rest in FX.TRADE
    ]
    th = [
        (t + rep * T_SHIFT, dts, st) for t, dts, st in FX.TRADE_HISTORY
    ]
    hh = [
        (prev + rep * T_SHIFT, cur + rep * T_SHIFT, b, a)
        for prev, cur, b, a in FX.HOLDING_HISTORY
    ]
    ct = [
        (ca + rep * CA_SHIFT, dts, amt, name)
        for ca, dts, amt, name in FX.CASH_TRANSACTION
    ]
    return {
        "daily_market": dm,
        "watch_history": watch,
        "trade": trade,
        "trade_history": th,
        "holding_history": hh,
        "cash_transaction": ct,
    }


#: delimited feeds that are entity volume: replicated with key shifts
REPLICATED = {
    "daily_market": "DailyMarket.txt",
    "watch_history": "WatchHistory.txt",
    "trade": "Trade.txt",
    "trade_history": "TradeHistory.txt",
    "holding_history": "HoldingHistory.txt",
    "cash_transaction": "CashTransaction.txt",
}


def replicate_raw(target: str | Path, copies: int = 10) -> Path:
    """Write a raw/ tree equal to ``copies`` key-shifted fixture
    worlds; returns the raw dir (idempotent via a marker file)."""
    target = Path(target)
    raw = target / "raw"
    marker = target / f"_COMPLETE_x{copies}"
    if marker.exists():
        return raw
    # a marker from a DIFFERENT copies value describes the files this
    # run is about to overwrite — drop it, or a later call with that
    # value would silently return the wrong-scale tree
    for stale in target.glob("_COMPLETE_x*"):
        stale.unlink()
    raw.mkdir(parents=True, exist_ok=True)

    fixture_tables = FX.delimited_tables()
    # volume-invariant reference feeds: written once, unshifted
    for source, (fname, rows) in fixture_tables.items():
        if source not in REPLICATED:
            sep = "," if fname.endswith(".csv") else "|"
            FX.write_delimited(raw / fname, rows, sep)

    merged: dict[str, list] = {s: [] for s in REPLICATED}
    fin_lines: list[str] = []
    xml_actions: list = []
    for rep in range(copies):
        for source, rows in _shift_delimited(rep).items():
            merged[source].extend(rows)
        fin_lines.extend(FX.finwire_raw_lines(_shift_finwire(rep)))
        xml_actions.extend(_shift_actions(rep))

    for source, rows in merged.items():
        fname = REPLICATED[source]
        sep = "," if fname.endswith(".csv") else "|"
        FX.write_delimited(raw / fname, rows, sep)
    (raw / "FINWIRE2017Q1").write_text("\n".join(fin_lines) + "\n")
    (raw / "CustomerMgmt.xml").write_text(
        FX.render_customer_mgmt_xml(xml_actions)
    )
    marker.touch()
    return raw


def replicate_batches(target: str | Path, copies: int = 10) -> Path:
    """Write raw_batch2/ + raw_batch3/ delta trees equal to ``copies``
    key-shifted fixture Batch2/Batch3 worlds — coherent with the
    ``replicate_raw`` tree of the same ``copies`` (every shifted
    trade/account/symbol/CIK the deltas reference exists in the
    replicated Batch1 world), so the one-command CLI
    (``build --batches 1,2,3``) can be exercised at the ×N scale
    points. Idempotent via a marker file; returns the target dir."""
    target = Path(target)
    marker = target / f"_BATCHES_COMPLETE_x{copies}"
    if marker.exists():
        return target
    for stale in target.glob("_BATCHES_COMPLETE_x*"):
        stale.unlink()
    specs = (
        ("raw_batch2", FX.TRADE2, FX.TRADE_HISTORY2,
         FX.TRADE_DELETES2, FX.FINWIRE_SETS2, FX.ACTIONS2,
         "FINWIRE2019Q1"),
        ("raw_batch3", FX.TRADE3, FX.TRADE_HISTORY3,
         FX.TRADE_DELETES3, FX.FINWIRE_SETS3, FX.ACTIONS3,
         "FINWIRE2019Q2"),
    )
    for dirname, trade, th, dels, fsets, actions, fw_name in specs:
        d = target / dirname
        d.mkdir(parents=True, exist_ok=True)
        trades: list = []
        ths: list = []
        delss: list = []
        fin_lines: list[str] = []
        acts: list = []
        for rep in range(copies):
            trades += [
                (t + rep * T_SHIFT, dts, st, tt, cash,
                 _sym(sym, rep), qty, bid, ca + rep * CA_SHIFT, *rest)
                for t, dts, st, tt, cash, sym, qty, bid, ca, *rest
                in trade
            ]
            ths += [(t + rep * T_SHIFT, dts, st) for t, dts, st in th]
            delss += [(t + rep * T_SHIFT,) for (t,) in dels]
            fin_lines += FX.finwire_raw_lines(tuple(
                (rt, lay, _shift_finwire_records(rt, recs, rep))
                for rt, lay, recs in fsets
            ))
            acts += _shift_actions(rep, actions)
        FX.write_delimited(d / "Trade.txt", trades, "|")
        FX.write_delimited(d / "TradeHistory.txt", ths, "|")
        FX.write_delimited(d / "TradeDeletes.txt", delss, "|")
        (d / fw_name).write_text("\n".join(fin_lines) + "\n")
        (d / "CustomerMgmt.xml").write_text(
            FX.render_customer_mgmt_xml(acts))
    marker.touch()
    return target
