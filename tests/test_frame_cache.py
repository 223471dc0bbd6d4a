"""_util.shared_frame cache discipline: hit-path LRU refresh (r8
advice — insertion-order eviction was evicting the HOTTEST frame first
once the cache filled) and eviction unpersists."""

from __future__ import annotations

from types import SimpleNamespace

from energy_consumption_forecasting_spark.queries import _util


class _Frame:
    def __init__(self) -> None:
        self.unpersisted = False

    def unpersist(self) -> None:
        self.unpersisted = True


def _stub_spark(app_id: str = "app-1"):
    return SimpleNamespace(sparkContext=SimpleNamespace(applicationId=app_id))


def test_shared_frame_hit_refreshes_lru(monkeypatch, tmp_path):
    monkeypatch.setattr(_util, "_FRAME_CACHE", {})
    monkeypatch.setattr(_util, "_FRAME_CACHE_MAX", 3)
    (tmp_path / "lineitem.parquet").write_text("x")  # mtime anchor
    spark = _stub_spark()
    sf = str(tmp_path)

    frames = {t: _Frame() for t in "abcd"}
    for t in "abc":
        got = _util.shared_frame(spark, sf, t, lambda t=t: frames[t])
        assert got is frames[t]

    # hit 'a' (the oldest): must move to the back of the eviction order
    assert _util.shared_frame(spark, sf, "a", lambda: _Frame()) is frames["a"]

    # inserting 'd' at capacity evicts 'b' (now oldest), NOT the hot 'a'
    _util.shared_frame(spark, sf, "d", lambda: frames["d"])
    assert frames["b"].unpersisted and not frames["a"].unpersisted
    assert _util.shared_frame(spark, sf, "a", lambda: _Frame()) is frames["a"]


def test_shared_frame_other_session_purged(monkeypatch, tmp_path):
    monkeypatch.setattr(_util, "_FRAME_CACHE", {})
    (tmp_path / "lineitem.parquet").write_text("x")
    sf = str(tmp_path)

    old = _Frame()
    _util.shared_frame(_stub_spark("app-old"), sf, "t", lambda: old)
    new = _Frame()
    got = _util.shared_frame(_stub_spark("app-new"), sf, "t", lambda: new)
    assert got is new and old.unpersisted
