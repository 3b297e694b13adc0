"""Oracle parity on a deliberately hostile clone of the sf0.01 data.

The driver regenerates /root/testdata every round, and every latent
failure this repo has ever found (sessionization ties, the OHLC
67.49125 half-boundary, the empty replay chunk) was data-dependent,
not logic-dependent. The driver's sampler also never reaches some
families (streaming went 0-for-5 rounds). This module makes the local
gate strictly stronger than the driver's: it re-runs oracle parity for
every events/documents query on a perturbed copy of sf0.01 that bakes
in the failure modes a future generator could emit:

* ``events.value`` on a 3-decimal grid with values sitting exactly ON
  scale-2 half boundaries (x.005), plus negatives — kills any
  ``round(sum(double), 2)`` or pandas half-even quantization;
* duplicate ``(user_id, ts)`` pairs (value/event_type copied so ties
  are value-identical) — kills window orderings without a unique
  tie-break;
* the time range squeezed so that chunks 1–2 of the 4-chunk
  multi-batch replay are EMPTY — kills replay passes that assume every
  quarter has files;
* documents extended with empty, whitespace-only, astral-plane
  (U+1D11E/U+1F600), single-char, and pathologically repetitive texts
  — kills UTF-16-unit char walking and shingles-shorter-than-text
  assumptions;
* (round 9) NULL ``events.user_id`` (unattributed telemetry) and NULL
  ``events.value`` — kills null-blind grouping, Spark-NULLS-FIRST vs
  DuckDB-NULLS-LAST orderings, NaN→int64 casts in pandas paths, and
  the min_by/arg_min null-value divergence (Spark RETURNS the null
  value at the extremal key, DuckDB SKIPS it). First run caught three
  real divergences: batch OHLC, streaming OHLC, grouped z-score.

Round 7 extends the same treatment to the TPC-H star schema (the
other ~60 queries ran only on pristine generator output for six
rounds):

* ``lineitem``/``orders``/``customer``/``part``/``supplier`` money
  columns re-gridded to 3 decimals sitting exactly ON scale-2 half
  boundaries (x.005) — kills any engine-side ``round(double, 2)``
  divergence in pricing aggregates;
* value-identical neighbor rows (ship dates, quantities, prices,
  order dates copied from the previous same-key row while primary
  keys stay distinct) — kills window orderings without a unique
  tie-break;
* ``l_shipdate`` partially collapsed onto a single day (every 3rd
  row) — the one-hot-partition skew shape;
* NULLs in non-key attributes (``o_orderpriority``,
  ``c_mktsegment``) — kills null-blind grouping/ordering;
* negative ``c_acctbal``/``s_acctbal`` (allowed by TPC-H).

Every query whose oracle touches a perturbed table runs here
(selected dynamically, so new operators are gated automatically).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from ceneton_database_tools_spark import operators as ops
from ceneton_database_tools_spark.catalog import TABLES, table_path
from tests.oracle_harness import compare_both, duck_con

SRC_SF = "/root/testdata/sf0.01"


_PERTURBED_TABLES = (
    "events",
    "documents",
    "embeddings",
    "lineitem",
    "orders",
    "customer",
    "part",
    "supplier",
)


def _perturbed_names() -> list[str]:
    import re

    # Word-boundary match: a bare substring test would select on alias
    # hits like n_orders / n_customers (underscore is a word char, so
    # \borders\b does NOT match those), pulling unrelated queries into
    # the hostile sweep.
    pats = [re.compile(rf"\b{t}\b") for t in _PERTURBED_TABLES]
    names = []
    for name, spec in ops.QUERIES.items():
        o = spec.oracle or ""
        if any(p.search(o) for p in pats):
            names.append(name)
    return sorted(names)


_NAMES = _perturbed_names()

# r15 slow tier (VERDICT r14 #1): the hostile sweep stays ALWAYS-ON for
# every bench query, every historically-divergent query, and every cheap
# query; the entries below are its most expensive members whose
# perturbation AXES are each still exercised always-on by another family
# member over the SAME corpus/prep helpers, and whose own end-to-end
# correctness stays always-on via oracle parity. They run in the
# builder's gate (SPARK_GRAFT_SLOW_TESTS=1).
_SLOW_PERTURBED = {
    # trained-index family (shared _base/_ivf_centroids preps): the
    # degenerate-embedding axes (zero vector, exact duplicate, constant
    # vector) stay always-on via similarity_topk_exact + similarity_ann_lsh
    "similarity_ann_ivf",
    "similarity_ivf_recall_eval",
    "similarity_ivf_recall_curve",
    # same axes over the twin-embedding corpus: dedup_embedding_cosine
    # stays always-on with the identical corpus builder
    "dedup_semantic_kmeans",
    # documents axes (NULL/empty/astral/repetitive text) stay always-on
    # via dedup_exact / dedup_minhash_lsh / the text_* sweep over the
    # same _near_corpus_tokens / shingle helpers
    "dedup_ngram_jaccard",
    "dedup_clusters",  # graph over dedup_minhash_lsh's always-on pair set
    # txn-over-perturbed-customer: the checkpoint/constraint machinery is
    # fixture-value-insensitive beyond what the always-on
    # txn_merge_upsert/txn_table_changes/txn_constraints_enforced +
    # txn integration suites already pin on the same perturbed axes
    "txn_checkpointed_admin_ops",
    "txn_checkpointed_row_ops",
    "txn_checkpointed_manifest_pruning",
    "txn_constraint_functions",
    # CDF composites over perturbed events: the cdc/cdf read path stays
    # always-on via txn_table_changes + streaming_agg_to_txn_table (bench)
    "streaming_txn_cdf",
    "streaming_txn_cdf_mv",
    "streaming_dedup_index_cdf",
    # layout variant: the scale_* family's other members stay always-on
    "scale_zorder_layout",
}
_PARAMS = [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PERTURBED else n
    for n in _NAMES
]


def _perturb_events(src: str, dst: str) -> None:
    ev = pd.read_parquet(src)

    # -- time squeeze: everything except the single max-ts event lands
    # in the first fifth of the range (exact integer µs/ns arithmetic;
    # dtype preserved so the parquet physical type doesn't change)
    arr = ev["ts"].to_numpy()
    t = arr.view("int64").copy()
    lo, hi = int(t.min()), int(t.max())
    imax = int(np.argmax(t))
    t_new = lo + (t - lo) // 5
    t_new[imax] = hi
    ev["ts"] = t_new.view(arr.dtype)

    # -- value re-grid: 2-decimal base + {±0.005, 0.001} → 3-decimal
    # values exactly on scale-2 half boundaries; every 7th negated
    idx = np.arange(len(ev))
    base = np.floor(ev["value"].to_numpy() * 100 + 0.5) / 100
    delta = np.select(
        [idx % 5 == 0, idx % 5 == 1, idx % 5 == 2], [0.005, -0.005, 0.001], 0.0
    )
    val = base + delta
    ev["value"] = np.where(idx % 7 == 0, -val, val)

    # -- malformed props: every 17th row's JSON is corrupt (truncated
    # object, garbage, empty string, truncated array) — must degrade
    # to NULL on both engines, never error. Clearly-INVALID strings
    # only: a valid-but-different shape (e.g. JSON 'null') is outside
    # the generator's documented {"k": N} contract, not dirty data.
    bad_props = np.array(['{"k": 1, oops', "not json at all", "", "[1, 2"])
    bad_mask = idx % 17 == 3
    props = ev["props"].to_numpy(dtype=object).copy()
    props[bad_mask] = bad_props[idx[bad_mask] % len(bad_props)]
    ev["props"] = props

    # -- heavy hitter (round 11): ~30% of all rows collapse onto ONE
    # existing user — the one-hot key that serializes an unsalted
    # shuffle and concentrates sessionization/stateful state. The
    # salted paths (agg_salted_two_stage, join_salted_skew) and every
    # user_id-grouped/sessionized query now prove correctness UNDER
    # skew, not just on the generator's uniform keys. Deterministic
    # choice (most frequent existing user), applied before the
    # tie-duplication below so value-identical ties also pile onto
    # the hot key.
    hot_user = int(ev["user_id"].mode().iloc[0])
    ev.loc[idx % 10 < 3, "user_id"] = hot_user

    # -- duplicate (user_id, ts) ties: copy ts/value/event_type from
    # the previous same-user row, keeping event_id/props distinct, so
    # only orderings without a unique tie-break can diverge
    ev = ev.sort_values(["user_id", "ts"], kind="mergesort").reset_index(drop=True)
    same_user = ev["user_id"].eq(ev["user_id"].shift())
    mask = (same_user & (np.arange(len(ev)) % 13 == 7)).to_numpy()
    for col in ("ts", "value", "event_type"):
        ev.loc[mask, col] = ev[col].shift()[mask]

    # -- NULL user_id (unattributed telemetry, every 59th row) and
    # NULL value (every 73rd): kills null-blind grouping, NULLS
    # FIRST/LAST ordering divergence (Spark asc = NULLS FIRST, DuckDB
    # asc = NULLS LAST), and any sum/avg that assumed no null inputs.
    # Int64 nullable dtype keeps the parquet type int64, now nullable.
    idx2 = np.arange(len(ev))
    uid = ev["user_id"].astype("Int64")
    uid[idx2 % 59 == 11] = pd.NA
    ev["user_id"] = uid
    val = ev["value"].to_numpy().copy()
    val[idx2 % 73 == 17] = np.nan
    ev["value"] = val  # NaN in float64 parquet round-trips as NULL

    ev.to_parquet(dst, index=False)


def _regrid_money(vals: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """2-decimal base + {±0.005, 0.001} — 3-decimal values exactly on
    scale-2 half boundaries, the grid where Spark's shortest-repr
    round() and DuckDB's binary-double round() disagree."""
    base = np.floor(vals * 100 + 0.5) / 100
    delta = np.select(
        [idx % 5 == 0, idx % 5 == 1, idx % 5 == 2], [0.005, -0.005, 0.001], 0.0
    )
    return base + delta


def _copy_prev_within(df: pd.DataFrame, key: str, cols: tuple[str, ...], mod: int,
                      rem: int) -> pd.DataFrame:
    """Copy ``cols`` from the previous same-``key`` row on a periodic
    mask — value-identical neighbors with distinct primary keys, the
    shape that breaks any window ORDER BY lacking a unique tie-break."""
    df = df.sort_values([key], kind="mergesort").reset_index(drop=True)
    same = df[key].eq(df[key].shift())
    mask = (same & (np.arange(len(df)) % mod == rem)).to_numpy()
    for col in cols:
        df.loc[mask, col] = df[col].shift()[mask]
    return df


def _perturb_lineitem(src: str, dst: str) -> None:
    li = pd.read_parquet(src)
    idx = np.arange(len(li))
    li["l_extendedprice"] = _regrid_money(li["l_extendedprice"].to_numpy(), idx)
    # discounts snapped to the 0.005 grid INSIDE [0, 0.10] — lands rows
    # exactly on q6's BETWEEN 0.05 AND 0.07 edges
    disc = np.floor(li["l_discount"].to_numpy() * 100 + 0.5) / 100
    li["l_discount"] = np.where(idx % 4 == 0, np.clip(disc + 0.005, 0.0, 0.10), disc)
    # one-day collapse: every 3rd row ships on the corpus max date
    # (one-hot partition skew); exact integer view keeps the physical type
    arr = li["l_shipdate"].to_numpy()
    t = arr.view("int64").copy()
    t[idx % 3 == 0] = int(t.max())
    li["l_shipdate"] = t.view(arr.dtype)
    li = _copy_prev_within(
        li, "l_orderkey", ("l_shipdate", "l_quantity", "l_extendedprice"), 7, 2
    )
    li.to_parquet(dst, index=False)


def _perturb_orders(src: str, dst: str) -> None:
    od = pd.read_parquet(src)
    idx = np.arange(len(od))
    od["o_totalprice"] = _regrid_money(od["o_totalprice"].to_numpy(), idx)
    # NULL priority every 41st row — null-blind grouping/ordering check
    pr = od["o_orderpriority"].to_numpy(dtype=object).copy()
    pr[idx % 41 == 5] = None
    od["o_orderpriority"] = pr
    od = _copy_prev_within(od, "o_custkey", ("o_orderdate", "o_totalprice"), 5, 1)
    od.to_parquet(dst, index=False)


def _perturb_customer(src: str, dst: str) -> None:
    cu = pd.read_parquet(src)
    idx = np.arange(len(cu))
    bal = _regrid_money(cu["c_acctbal"].to_numpy(), idx)
    bal = np.where(idx % 9 == 4, -np.abs(bal), bal)  # TPC-H allows < 0
    # NULL c_acctbal every 43rd row (round 8): the txn-table queries
    # (merge/CDF/schema-evolution) carry the balance through staged
    # parquet and change-feed diffs — a null-blind comparison or an
    # aggregate that assumes non-null balances diverges here
    cu["c_acctbal"] = np.where(idx % 43 == 7, np.nan, bal)
    seg = cu["c_mktsegment"].to_numpy(dtype=object).copy()
    seg[idx % 37 == 11] = None
    cu["c_mktsegment"] = seg
    cu.to_parquet(dst, index=False)


def _perturb_part(src: str, dst: str) -> None:
    pt = pd.read_parquet(src)
    idx = np.arange(len(pt))
    pt["p_retailprice"] = _regrid_money(pt["p_retailprice"].to_numpy(), idx)
    pt = _copy_prev_within(pt, "p_brand", ("p_retailprice", "p_size"), 6, 3)
    pt.to_parquet(dst, index=False)


def _perturb_supplier(src: str, dst: str) -> None:
    su = pd.read_parquet(src)
    idx = np.arange(len(su))
    bal = _regrid_money(su["s_acctbal"].to_numpy(), idx)
    su["s_acctbal"] = np.where(idx % 9 == 4, -np.abs(bal), bal)
    su.to_parquet(dst, index=False)


def _perturb_documents(src: str, dst: str) -> None:
    docs = pd.read_parquet(src)
    next_id = int(docs["doc_id"].max()) + 1
    langs = [x for x in docs["lang"].dropna().unique().tolist()] or ["en"]
    source = (
        docs["source"].dropna().iloc[0] if docs["source"].notna().any() else "web"
    )
    extra_texts = [
        "",
        "   \n\t ",
        "music \U0001d11e clef emoji \U0001f600\U0001f600 rocket \U0001f680 end",
        ("spam " * 200).strip(),
        "a",
        "café naïve coöperate 中文文本测试",
        None,  # round 8: NULL text — the shape a failed extraction emits
    ]
    extra = pd.DataFrame(
        {
            "doc_id": np.arange(next_id, next_id + len(extra_texts), dtype="int64"),
            "text": extra_texts,
            # round 8: one NULL lang (the single-char doc) — unlabeled
            # docs must not train the langid profile, only be predicted
            "lang": [
                None if i == 4 else langs[i % len(langs)]
                for i in range(len(extra_texts))
            ],
            "source": [source] * len(extra_texts),
            "n_chars": np.array(
                [len(t) if t is not None else 0 for t in extra_texts],
                dtype="int64",
            ),
        }
    )
    pd.concat([docs, extra], ignore_index=True).to_parquet(dst, index=False)


def _perturb_embeddings(src: str, dst: str) -> None:
    """Append the vectors a real embedding pipeline eventually meets:
    an all-zero vector (norm 0 — cosine denominators), an EXACT
    duplicate of an existing vector (perfect-tie ordering), and a
    constant-positive vector (every sign-LSH bit identical)."""
    emb = pd.read_parquet(src)
    next_id = int(emb["vec_id"].max()) + 1
    dim = len(emb["embedding"].iloc[0])
    labels = emb["label"].dropna().unique().tolist() or [0]
    extra = pd.DataFrame(
        {
            "vec_id": np.arange(next_id, next_id + 3, dtype="int64"),
            "embedding": [
                np.zeros(dim, dtype="float32"),
                np.asarray(emb["embedding"].iloc[0], dtype="float32"),
                np.full(dim, 0.125, dtype="float32"),
            ],
            "label": np.array(
                [labels[i % len(labels)] for i in range(3)],
                dtype=emb["label"].dtype,
            ),
        }
    )
    pd.concat([emb, extra], ignore_index=True).to_parquet(dst, index=False)


@pytest.fixture(scope="session")
def sf_perturbed(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("sf_perturbed"))
    for name in TABLES:
        src = table_path(SRC_SF, name)
        dst = table_path(out, name)
        if name == "events":
            _perturb_events(src, dst)
        elif name == "documents":
            _perturb_documents(src, dst)
        elif name == "embeddings":
            _perturb_embeddings(src, dst)
        elif name == "lineitem":
            _perturb_lineitem(src, dst)
        elif name == "orders":
            _perturb_orders(src, dst)
        elif name == "customer":
            _perturb_customer(src, dst)
        elif name == "part":
            _perturb_part(src, dst)
        elif name == "supplier":
            _perturb_supplier(src, dst)
        else:
            os.symlink(src, dst)
    return out


@pytest.fixture(scope="module")
def con_perturbed(sf_perturbed):
    con = duck_con(sf_perturbed)
    yield con
    con.close()


@pytest.mark.parametrize("name", _PARAMS)
def test_query_matches_oracle_on_perturbed_data(
    spark, sf_perturbed, con_perturbed, name
):
    spec = ops.QUERIES[name]
    df = spec.fn(spark, sf_perturbed)
    oracle = ops.render_oracle(spec.oracle, sf_perturbed)
    problems = compare_both(df, con_perturbed, oracle)
    assert not problems, f"{name} (perturbed):\n" + "\n".join(problems)
