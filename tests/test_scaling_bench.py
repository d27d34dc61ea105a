"""Smoke test of the multi-chip scaling harness on the virtual CPU mesh.

On real hardware ``bench_scaling.py`` measures data-parallel tick throughput
vs chip count (BASELINE.md >=90% scaling target); here the mechanics —
mesh construction per count, sharded placement, chained-slope measurement,
efficiency record — are exercised end to end on 8 virtual CPU devices.
CPU timing is NOT a scaling statement (host cores are oversubscribed), so
only structure and finiteness are asserted.
"""
import json


def test_scaling_sweep_mechanics():
    import bench_scaling

    lines = []
    recs = bench_scaling.measure_scaling(
        device_counts=[1, 2], batch_per_chip=8, N=6, reps=1, k_lo=1, k_hi=3,
        emit=lines.append,
    )
    assert [r["devices"] for r in recs] == [1, 2]
    assert all(r["value"] > 0 for r in recs)
    parsed = [json.loads(l) for l in lines]
    eff = [p for p in parsed if p["metric"] == "scaling_efficiency"]
    assert len(eff) == 1 and eff[0]["value"] > 0
