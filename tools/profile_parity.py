"""Profile the gx1-parity step on the TPU and print the hlo_stats table.

Usage (TPU):
    env PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_parity.py
Options: --nilyr7  (profile the 7-layer column instead of the build
default nilyr=4), --top N (rows to print, default 40).
"""
import glob
import os
import sys


def main():
    sys.path.insert(0, "/root/repo")
    import bench

    nilyr7 = "--nilyr7" in sys.argv
    top = 40
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])

    from cice5_tpu.config import gx1_parity_config
    from cice5_tpu.driver.model import Model
    cfg = gx1_parity_config(**({"nilyr": 7} if nilyr7 else {}))
    grid = bench.synth_gx1_grid(cfg)
    m = Model(cfg, grid=grid)
    st = m.init_state()
    f = m.forcing_at(0)
    # spin a few steps so masks are realistic
    for _ in range(3):
        st, _ = m.step(st, f)
    outdir = "/tmp/cice5_profile"
    os.system(f"rm -rf {outdir}")
    m.profile(st, nsteps=3, outdir=outdir)

    pbs = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    assert pbs, f"no xplane.pb under {outdir}"
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([max(pbs, key=os.path.getmtime)],
                                      "hlo_stats", {})
    import json
    tbl = json.loads(data.decode() if isinstance(data, bytes) else data)
    ids = [c["id"] for c in tbl["cols"]]
    rows = [{i: (c or {}).get("v") for i, c in zip(ids, r["c"])}
            for r in tbl["rows"]]
    rows.sort(key=lambda r: -(r.get("total_self_time") or 0))
    tot = sum(r.get("total_self_time") or 0 for r in rows)
    print(f"total {tot/1e3/3:.3f} ms/step over 3 steps")
    for r in rows[:top]:
        t = (r.get("total_self_time") or 0) / 3e3
        expr = (r.get("hlo_op_expression") or "")[:64]
        src = (r.get("source_info") or r.get("source_stack") or "")
        print(f"{t:8.3f} ms  {expr!r:66s} {r.get('bound_by','')!s:10s} "
              f"{str(src)[:48]}")


if __name__ == "__main__":
    main()
