"""Migration facade (api.py): the reference's class API drives the
Spark-backed pipelines — same names, same call shapes, documented
DataFrame-for-pandas delta."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from energy_consumption_forecasting_spark.api import (
    ETL,
    BayesianOptimization,
    BayesianOptimizationConfig,
    BlockingTimeSeriesSplit,
    ConsumptionForecasterTrainer,
    ETLConfig,
)
from tests.conftest import SF_SMALL

RING = [(-95.0, 35.0), (-85.0, 35.0), (-85.0, 45.0), (-95.0, 45.0)]


def test_etl_config_attr_bag():
    cfg = ETLConfig(start_year=2021, end_year=2022)
    assert cfg.start_year == 2021 and cfg.unknown_field is None


def test_etl_weather_chain(spark):
    """generate_weather == the reference's station→melt→pivot→clean→
    fill→calendar→enrich chain, driven through the facade."""
    stations = spark.createDataFrame(
        [
            ("US000000001", 40.0, -90.0, 200.0, "MI_CITY_1"),
            ("US000000004", 36.0, -86.0, 150.0, "MI_CITY_3"),
            ("US000000002", 50.0, -90.0, 210.0, "MI_CITY_2"),
        ],
        "ID string, lat double, long double, elev double, city string",
    )
    rows = []
    for sid in ("US000000001", "US000000004"):
        for elem in ("TMAX", "PRCP"):
            vals = {f"VALUE{d}": float(d) for d in range(1, 32)}
            rows.append(
                {"ID": sid, "YEAR": 2021, "MONTH": 4, "ELEMENT": elem, **vals}
            )
    daily = spark.createDataFrame(rows)

    etl = ETL(ETLConfig(start_year=2016, end_year=2024), spark)
    out = etl.generate_weather(
        stations=stations, daily_wide=daily, ring=RING
    )
    got = out.collect()
    assert got
    # both in-ring stations survive, day 31 of April dropped (W13)
    assert {r.ID for r in got} == {"US000000001", "US000000004"}
    assert all(r.DATE.day <= 30 for r in got)
    # enrichment carried the station dimension back on
    assert {"lat", "long", "elev", "city"} <= set(out.columns)


def test_blocking_split_matches_reference_shape(spark):
    """5 blocks, ~20% validation tail per block, train before val in
    time order — the utils.py:8 contract on DataFrames."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )
    n = orders.count()
    splitter = BlockingTimeSeriesSplit(n_splits=5, val_size=0.2)
    seen = 0
    for train, val in splitter.split(orders, ["o_orderdate", "o_orderkey"]):
        tn, vn = train.count(), val.count()
        seen += tn + vn
        assert vn == pytest.approx(0.2 * (tn + vn), abs=1)
        # time ordering: max train date <= min val date boundary-safe
        tmax = train.agg(F.max("o_orderdate")).first()[0]
        vmin = val.agg(F.min("o_orderdate")).first()[0]
        assert tmax <= vmin
    assert seen == n


def test_bayes_opt_facade_minimizes():
    cfg = BayesianOptimizationConfig(
        objective=lambda x: float((x[0] - 0.3) ** 2),
        hp_bounds=[(0.0, 1.0)],
        search_size=12,
        seed=3,
    )
    bo = BayesianOptimization(cfg)
    result = bo.tune(spark=None)
    assert abs(result["best_x"][0] - 0.3) < 0.2
    assert bo.searched_params == result


def test_trainer_facade_fits_and_predicts():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 4, 2)).astype(np.float64)
    y = (X[:, -1, 0] * 0.5 + 0.1).astype(np.float64)
    tr = ConsumptionForecasterTrainer()
    tr.config.epochs = 2
    tr.fit(X, y)
    pred = tr.predict(X)
    assert pred.shape == (64,)
    assert np.isfinite(pred).all()


def test_etl_balance_sheets_from_csvs(spark, tmp_path):
    """The facade's default path scans per-year CSV globs and runs the
    EP1a chain: region filter, Adjusted-column selection, name
    normalization, union across ragged years."""
    hdr21 = (
        "Balancing Authority,Data Date,Hour Number,Region,"
        "local_time_end_hour,Demand (MW) (Adjusted),"
        "Net Generation (MW) (Adjusted),Demand (MW) (Imputed)\n"
    )
    rows21 = [
        f"MISO,01/0{d}/2021,{h},MIDW,2021-01-0{d} {h:02d}:00:00,"
        f"{100 + h},{90 + h},{999}\n"
        for d in (1, 2)
        for h in range(1, 4)
    ]
    # 2022 adds a column the 2021 file lacks (ragged union)
    hdr22 = hdr21.rstrip("\n") + ",Interchange (MW) (Adjusted)\n"
    rows22 = [
        f"MISO,01/0{d}/2022,{h},MIDW,2022-01-0{d} {h:02d}:00:00,"
        f"{200 + h},{190 + h},{999},{5 + h}\n"
        for d in (1, 2)
        for h in range(1, 4)
    ]
    # plus an out-of-region row that must be filtered
    rows22.append(
        "PJM,01/01/2022,1,MIDA,2022-01-01 01:00:00,1,1,999,1\n"
    )
    (tmp_path / "EIA930_BALANCE_2021_Jan_Jun.csv").write_text(
        hdr21 + "".join(rows21)
    )
    (tmp_path / "EIA930_BALANCE_2022_Jan_Jun.csv").write_text(
        hdr22 + "".join(rows22)
    )

    etl = ETL(
        ETLConfig(start_year=2021, end_year=2022, data_path=str(tmp_path)),
        spark,
    )
    out = etl.balance_sheets()
    rows = out.collect()
    assert len(rows) == 12  # 6 per year, PJM row filtered
    cols = set(out.columns)
    # Imputed dropped pre-normalization; the name rule then strips the
    # "(MW) (Adjusted)" parentheticals (reference ETL.py:87)
    assert {"demand", "net_generation", "interchange"} <= cols
    assert not any("imputed" in c for c in cols)


def test_download_then_balance_sheets(spark, tmp_path):
    """The reference's download-then-read flow through the facade: a
    localhost server stands in for the EIA endpoint; the staged CSVs
    then feed the EP1a chain."""
    import http.server
    import os
    import socketserver
    import threading

    hdr = (
        "Balancing Authority,Data Date,Hour Number,Region,"
        "local_time_end_hour,Demand (MW) (Adjusted)\n"
    )
    rows = [
        f"MISO,01/0{d}/2021,{h},MIDW,2021-01-0{d} {h:02d}:00:00,{100 + h}\n"
        for d in (1, 2)
        for h in (1, 2)
    ]
    serve = tmp_path / "served"
    os.makedirs(serve)
    for half in ("Jan_Jun", "Jul_Dec"):
        (serve / f"EIA930_BALANCE_2021_{half}.csv").write_text(
            hdr + "".join(rows)
        )

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(serve), **kw
    )
    with socketserver.TCPServer(("127.0.0.1", 0), handler) as httpd:
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            etl = ETL(
                ETLConfig(
                    start_year=2021,
                    end_year=2021,
                    data_path=str(tmp_path / "stage"),
                ),
                spark,
            )
            staged = etl.download_balance_sheets(
                base_url=f"http://127.0.0.1:{port}"
            )
            assert len(staged) == 2 and all(os.path.exists(p) for p in staged)
            out = etl.balance_sheets()
            assert out.count() == 8  # 4 rows x 2 staged halves
        finally:
            httpd.shutdown()
