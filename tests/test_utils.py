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


class TestProcessSampleLoader:
    """Round-4 multi-process host input pipeline (SURVEY §2.2 row)."""

    def _dataset(self):
        from bathymetric_gnn_tpu.config.config import (BucketConfig, Config,
                                                       ModelConfig)
        from bathymetric_gnn_tpu.training.datasets import SyntheticTileDataset
        from conftest import make_ramp_surface

        cfg = Config(model=ModelConfig(hidden_channels=8, num_layers=2),
                     bucket=BucketConfig(node_buckets=(2048,)))
        grids = [make_ramp_surface(80, 80, seed=i) for i in range(2)]
        return SyntheticTileDataset(grids, cfg, tile_size=40, overlap=8,
                                    min_valid_ratio=0.0, seed=0)

    def test_matches_inprocess_reference(self):
        import numpy as np

        from bathymetric_gnn_tpu.training.datasets import collate_samples
        from bathymetric_gnn_tpu.utils.mp_loader import ProcessSampleLoader

        ds = self._dataset()
        bs = 2
        with ProcessSampleLoader(ds, num_workers=2) as loader:
            got = list(loader.epoch_batches(bs, np.random.default_rng(5)))
        assert len(got) == len(ds) // bs

        # replicate the loader's seeding contract in-process
        rng = np.random.default_rng(5)
        order = np.arange(len(ds))
        rng.shuffle(order)
        base = int(rng.integers(1 << 30))
        order = order[:len(ds) - len(ds) % bs]
        want = []
        for s in range(0, len(order), bs):
            want.append(collate_samples(
                [ds.finalize(ds.raw_item(int(i), seed=base + int(i)))
                 for i in order[s:s + bs]]))
        for (g1, t1), (g2, t2) in zip(got, want):
            np.testing.assert_allclose(np.asarray(g1.x), np.asarray(g2.x),
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_array_equal(t1["labels"], t2["labels"])
            np.testing.assert_allclose(t1["correction"], t2["correction"],
                                       rtol=1e-6, atol=1e-6)

    def test_worker_schedule_independence(self):
        """Same seed, different worker counts -> identical batches."""
        import numpy as np

        from bathymetric_gnn_tpu.utils.mp_loader import ProcessSampleLoader

        ds = self._dataset()
        outs = []
        for nw in (1, 2):
            with ProcessSampleLoader(ds, num_workers=nw) as loader:
                outs.append(list(
                    loader.epoch_batches(2, np.random.default_rng(7))))
        for (g1, t1), (g2, t2) in zip(*outs):
            np.testing.assert_array_equal(np.asarray(g1.x),
                                          np.asarray(g2.x))
            np.testing.assert_array_equal(t1["labels"], t2["labels"])

    def test_rejects_unsplittable(self):
        import pytest as _pytest

        from bathymetric_gnn_tpu.utils.mp_loader import ProcessSampleLoader

        with _pytest.raises(TypeError):
            ProcessSampleLoader([1, 2, 3], num_workers=1)
