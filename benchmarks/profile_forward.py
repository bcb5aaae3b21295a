"""Profile the flagship fused-Pallas forward on the real TPU.

Captures a jax.profiler trace of the bf16 fused-kernel full-model forward
(same config as bench.py) and prints the per-fusion device-time breakdown,
so optimization effort goes where the time actually is.
"""

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TILE = 256
ITERS = 12


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
    from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN

    h = w = TILE
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 30.0 + 0.05 * xx + 0.02 * yy + 0.5 * np.sin(xx / 7.0)
    valid = np.ones((h, w), bool)
    on_tpu = jax.default_backend() == "tpu"
    model = GridBathymetricGNN(hidden_channels=64, num_layers=4, heads=4,
                               use_pallas=on_tpu,
                               compute_dtype="bfloat16" if on_tpu
                               else "float32")
    feats, v, nbr, eattr, _ = build_grid_inputs(base, valid)
    variables = model.init(jax.random.PRNGKey(0), feats, v, nbr, eattr)

    @jax.jit
    def chained(feats, v, nbr, eattr, n_iters):
        def body(i, f):
            out = model.apply(variables, f, v, nbr, eattr)
            # data-dependent chain: perturb input with output checksum
            s = (jnp.sum(out["confidence"]) * 1e-9).astype(f.dtype)
            return f + s
        return jax.lax.fori_loop(0, n_iters, body, feats)

    feats = jnp.asarray(feats)
    r = chained(feats, v, nbr, eattr, ITERS)
    float(jnp.sum(r))  # warm

    trace_dir = Path("/tmp/prof_fwd")
    with jax.profiler.trace(str(trace_dir)):
        r = chained(feats, v, nbr, eattr, ITERS)
        float(jnp.sum(r))

    files = glob.glob(str(trace_dir / "**/*.trace.json.gz"), recursive=True)
    if not files:
        print("no trace file found under", trace_dir)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)

    # aggregate device-track complete events by name
    pid_names = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    total = 0.0
    for ev in tr["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "?")
        dur_by_name[name] += ev.get("dur", 0)
        cnt_by_name[name] += 1
        total += ev.get("dur", 0)
    rows = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:30]
    print(f"{'us_total':>10} {'count':>6}  name   (device total {total:.0f} us,"
          f" {total / ITERS:.0f} us/iter)")
    for name, us in rows:
        print(f"{us:10.0f} {cnt_by_name[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
