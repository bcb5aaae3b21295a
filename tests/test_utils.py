"""Utility coverage: prefetch iterator, profiling helpers."""

import time

import numpy as np
import pytest

from bathymetric_gnn_tpu.utils.prefetch import (PrefetchingLoader,
                                                prefetch_iterator)
from bathymetric_gnn_tpu.utils.prof import (MetricsLogger, Stopwatch,
                                            ThroughputMeter)


class TestPrefetch:
    def test_order_preserved(self):
        assert list(prefetch_iterator(iter(range(50)))) == list(range(50))

    def test_exception_propagates(self):
        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetch_iterator(gen())
        assert next(it) == 1
        with pytest.raises(ValueError):
            list(it)

    def test_overlaps_producer(self):
        t0 = time.time()

        def slow():
            for i in range(5):
                time.sleep(0.05)
                yield i

        for i in prefetch_iterator(slow(), depth=2):
            time.sleep(0.05)  # consumer work overlaps producer
        wall = time.time() - t0
        assert wall < 0.45  # serial would be ~0.5s

    def test_loader_reusable(self):
        loader = PrefetchingLoader(lambda: iter([1, 2, 3]))
        assert list(loader) == [1, 2, 3]
        assert list(loader) == [1, 2, 3]


class TestProf:
    def test_stopwatch(self):
        sw = Stopwatch()
        with sw.time("a"):
            time.sleep(0.01)
        with sw.time("a"):
            pass
        s = sw.summary()
        assert s["a"]["count"] == 2
        assert s["a"]["total_s"] >= 0.01

    def test_throughput_meter(self):
        m = ThroughputMeter()
        m.add(edges=1000, nodes=100, tiles=1)
        r = m.rates()
        assert r["edges_per_s"] > 0

    def test_metrics_logger_jsonl(self, tmp_path):
        import json

        p = tmp_path / "m.jsonl"
        ml = MetricsLogger(str(p))
        ml.log(0, {"loss": 1.0})
        ml.log(1, {"loss": 0.5})
        lines = [json.loads(x) for x in p.read_text().splitlines()]
        assert lines[1]["loss"] == 0.5 and lines[1]["step"] == 1


class TestBenchImports:
    def test_bench_and_entry_importable(self):
        import importlib.util
        from pathlib import Path

        root = Path(__file__).resolve().parent.parent
        for name in ("bench", "__graft_entry__"):
            spec = importlib.util.spec_from_file_location(
                name, root / f"{name}.py")
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            assert hasattr(mod, "main") or hasattr(mod, "entry")
