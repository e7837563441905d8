"""Per-MB decision diff vs the reference oracle.

Runs one parity config through both encoders, dumps the oracle's per-MB
decisions (ORACLE_DUMP hook in tools/oracle/oracle_cli.c, reading the
h->mb tables of common/common.h:777-793) and ours (the _last_syn /
_last_mb_types debug handles), and reports where they diverge: frame
types/QPs/bytes, MB-type confusion, MV/ref/cbp agreement. This is the
instrument VERDICT r2 asked for to close the CABAC+CRF parity gap.

Usage: python tools/mbdiff.py [--config 4_cif_ippp_cabac_crf] [--frames 6]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/x264tpu_jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

import numpy as np  # noqa: E402

from parity import CONFIGS, synth_clip  # noqa: E402

# oracle mb_class_e (common/macroblock.h:41) → coarse class matching our
# writer's mb_types map (0 i16, 1 i4, 2 pl0/p8x8, 3 skip)
ORACLE_CLASS = {0: 1, 2: 0, 4: 2, 5: 2, 6: 3}
CLASS_NAMES = {0: "I16", 1: "I4", 2: "P", 3: "SKIP", -1: "?"}


def parse_oracle_dump(path):
    frames = []
    cur = None
    for line in Path(path).read_text().splitlines():
        t = line.split()
        if t[0] == "frame":
            cur = {"type": int(t[3]), "bytes": int(t[5]),
                   "satd": int(t[7]), "qprc": float(t[9]), "mb": {}}
            frames.append(cur)
        elif t[0] == "lowsum":
            cur.setdefault("lowsum", {})[(int(t[2]), int(t[1]))] = int(t[3])
        elif t[0] == "low":
            cur.setdefault("low", {})[(int(t[2]), int(t[1]))] = {
                "mv": (int(t[4]), int(t[5])), "cost": int(t[7])}
        else:
            x, y = int(t[0]), int(t[1])
            cur["mb"][(y, x)] = {
                "t": int(t[3]), "part": int(t[5]), "qp": int(t[7]),
                "cbp": int(t[9]), "ref": int(t[11]),
                "mv": (int(t[13]), int(t[14])), "cpm": int(t[16]),
                "i4": [int(v) for v in t[18:25]],
            }
    return frames


def run_oracle(frames, w, h, workdir, env_cfg, n):
    oracle = Path(os.environ.get("X264_ORACLE_DIR", "/tmp/x264ref"))
    exe = oracle / "oracle_cli"
    if not exe.exists():
        subprocess.run(["bash", str(REPO / "tools/build_reference_oracle.sh"),
                        str(oracle)], check=True, capture_output=True)
    from x264dsp_tpu.utils.yuv import write_yuv
    yuv = Path(workdir) / f"{w}x{h}.yuv"
    dump = Path(workdir) / "oracle_mb.txt"
    write_yuv(str(yuv), frames)
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_cfg.items()})
    env["ORACLE_DUMP"] = str(dump)
    subprocess.run([str(exe), str(yuv), str(Path(workdir) / "ref.264")],
                   check=True, capture_output=True, env=env)
    return parse_oracle_dump(dump)


def run_ours(frames, w, h, cfg):
    import x264dsp_tpu as xt

    p = xt.param_default()
    p.i_width, p.i_height = w, h
    for k, v in cfg.items():
        if k.startswith("rc."):
            setattr(p.rc, k[3:], v)
        elif k.startswith("analyse."):
            setattr(p.analyse, k[8:], v)
        else:
            setattr(p, k, v)
    enc = xt.Encoder(p)
    enc.headers()
    out = []
    for i, (y, u, v) in enumerate(frames):
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v, pts=i))
        core = enc._core
        syn = core._last_syn
        is_p = "partition" in syn
        cbp_l = np.array(syn["cbp_luma"])
        cbp_c = np.array(syn["cbp_chroma"])
        if is_p:
            # coarse class: coded P = 2; uncoded part-0 ref-0 MBs are
            # skip candidates (exact skip additionally needs
            # mv == pskip mv; the host writers decide that per MB)
            part = np.array(syn["partition"])
            ref = np.array(syn["ref"])
            cdc = np.array(syn["chroma_nz_dc"]).any(-1)
            cls = np.where((part == 0) & (ref == 0) & (cbp_l == 0)
                           & (cbp_c == 0) & ~cdc, 3, 2)
        else:
            cls = np.array(syn["mb_type"])  # 0 i16, 1 i4
        rec = {
            "bytes": sum(len(n.payload) for n in nals),
            "type": po.i_frame_type,
            "satd": core.rc.last_satd,
            "qprc": core.rc.qpa_rc,
            "low": {k: np.array(v)
                    for k, v in getattr(core.slicetype, "dbg", {}).items()},
            "qp_mb": np.array(core._last_qp_mb),
            "mb_types": cls,
            "mv": np.array(syn["mv"]) if "mv" in syn else None,
            "ref": np.array(syn["ref"]) if is_p else None,
            "part": np.array(syn["partition"]) if is_p else None,
            "cbp_luma": cbp_l,
            "cbp_chroma": cbp_c,
        }
        out.append(rec)
    enc.close()
    return out


def main():
    # pin CPU like tools/parity.py: the image's axon hook overrides
    # JAX_PLATFORMS and would block this host-side tool on accelerator
    # init otherwise
    if os.environ.get("X264_PARITY_ON_TPU") != "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="4_cif_ippp_cabac_crf")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="temporally-independent sensor noise sigma")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    c = CONFIGS[args.config]
    w, h, n = c["w"], c["h"], args.frames
    clip = synth_clip(w, h, n)
    if args.noise > 0:
        rng = np.random.default_rng(1003)
        clip = [(np.clip(y.astype(np.int16) + np.round(
            rng.normal(0, args.noise, y.shape)).astype(np.int16),
            0, 255).astype(np.uint8), u, v) for (y, u, v) in clip]
    with tempfile.TemporaryDirectory() as td:
        oracle = run_oracle(clip, w, h, td, c["oracle"], n)
    ours = run_ours(clip, w, h, c["params"])

    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    for f in range(min(len(oracle), len(ours))):
        om, um = oracle[f], ours[f]
        oqp = np.array([[om["mb"][(y, x)]["qp"] for x in range(mb_w)]
                        for y in range(mb_h)])
        print(f"\n== frame {f}: oracle type {om['type']} "
              f"{om['bytes']}B qp {oqp.mean():.2f} "
              f"(rc {om['qprc']:.3f}, satd {om['satd']}) | "
              f"ours type {um['type']} {um['bytes']}B "
              f"qp {um['qp_mb'].mean():.2f} "
              f"(rc {um['qprc']:.3f}, satd {um['satd']})")
        # MB class confusion
        conf = Counter()
        mv_eq = mv_tot = cbp_eq = 0
        for y in range(mb_h):
            for x in range(mb_w):
                ocls = ORACLE_CLASS.get(om["mb"][(y, x)]["t"], -1)
                ucls = (int(um["mb_types"][y, x])
                        if um["mb_types"].ndim == 2 else -1)
                conf[(ocls, ucls)] += 1
                ocbp = om["mb"][(y, x)]["cbp"] & 0xFF
                ucbp = (int(um["cbp_luma"][y, x])
                        | (int(um["cbp_chroma"][y, x]) << 4))
                if ocls == ucls == 2:
                    mv_tot += 1
                    if (um["mv"] is not None and tuple(
                            um["mv"][y, x]) == om["mb"][(y, x)]["mv"]):
                        mv_eq += 1
                if ocbp == ucbp:
                    cbp_eq += 1
        # among MBs the oracle codes as P with the SAME mv as ours:
        # how often do we still zero the residual? (isolates
        # quant/decimate divergence from ME divergence)
        same_mv_oP = same_mv_oP_we_zero = 0
        if um["mv"] is not None:
            for y in range(mb_h):
                for x in range(mb_w):
                    o = om["mb"][(y, x)]
                    if ORACLE_CLASS.get(o["t"]) != 2:
                        continue
                    if tuple(um["mv"][y, x]) != o["mv"]:
                        continue
                    same_mv_oP += 1
                    if (int(um["cbp_luma"][y, x]) == 0
                            and int(um["cbp_chroma"][y, x]) == 0):
                        same_mv_oP_we_zero += 1
            if same_mv_oP:
                print(f"   same-mv oracle-P MBs: {same_mv_oP}, of which "
                      f"we code zero residual: {same_mv_oP_we_zero}")
        # ref agreement + MV deltas among both-P MBs (multiref diag)
        if um["ref"] is not None:
            ref_eq = ref_tot = 0
            refconf = Counter()
            mvd = []
            part_conf = Counter()
            for y in range(mb_h):
                for x in range(mb_w):
                    o = om["mb"][(y, x)]
                    ocls = ORACLE_CLASS.get(o["t"], -1)
                    ucls = int(um["mb_types"][y, x])
                    if ocls != 2 or ucls != 2:
                        continue
                    uref = int(np.ravel(um["ref"][y, x])[0])
                    ref_tot += 1
                    refconf[(o["ref"], uref)] += 1
                    part_conf[(o["part"],
                               int(np.ravel(um["part"][y, x])[0]))] += 1
                    if o["ref"] == uref and um["mv"] is not None:
                        umv = tuple(um["mv"][y, x])
                        if umv != o["mv"]:
                            mvd.append((abs(umv[0] - o["mv"][0])
                                        + abs(umv[1] - o["mv"][1]),
                                        (y, x), o["mv"], umv, o["ref"]))
                    if o["ref"] == uref:
                        ref_eq += 1
            if ref_tot:
                print(f"   ref eq {ref_eq}/{ref_tot} among both-P; "
                      f"confusion {dict((f'{a}->{b}', v) for (a, b), v in refconf.items() if a != b)}")
                pm = {f"{a}->{b}": v for (a, b), v
                      in sorted(part_conf.items(), key=lambda kv: -kv[1])
                      if a != b}
                if pm:
                    print(f"   partition confusion (oracle->ours): {pm}")
                if mvd:
                    mvd.sort(reverse=True)
                    print(f"   same-ref mv mismatches: {len(mvd)}, "
                          f"|d| quartiles "
                          f"{[mvd[int(q * (len(mvd) - 1))][0] for q in (1.0, 0.75, 0.5, 0.25, 0)][::-1]}")
                    for d, (y, x), omv, umv, r in mvd[:8]:
                        print(f"     ({y},{x}) ref {r} oracle {omv} "
                              f"ours {umv}")
        tot = mb_w * mb_h
        agree = sum(v for (a, b), v in conf.items() if a == b)
        print(f"   mb class agree {agree}/{tot} "
              f"({100.0 * agree / tot:.1f}%), cbp eq "
              f"{100.0 * cbp_eq / tot:.1f}%, mv eq "
              f"{mv_eq}/{mv_tot} among both-P")
        mism = {f"{CLASS_NAMES[a]}->{CLASS_NAMES[b]}": v
                for (a, b), v in sorted(conf.items(),
                                        key=lambda kv: -kv[1]) if a != b}
        if mism:
            print(f"   confusion (oracle->ours): {mism}")
        # lowres lookahead per-block comparison (P frames)
        if "low" in om and um.get("low") and "pcost" in um["low"]:
            ol = om["low"]
            up = um["low"]["pcost"]
            worst = []
            ocost_sum = ucost_sum = mveq = 0
            for (y, x), o in ol.items():
                # oracle lowres_mv_costs excludes the +4 lowres_penalty;
                # ours (pcost) includes it — compare cost+4, and note the
                # oracle per-block cost is pre-intra-min
                uc = int(up[y, x])
                oc = o["cost"] + 4
                ocost_sum += oc
                ucost_sum += uc
                umv = (int(um["low"]["mvx"][y, x]),
                       int(um["low"]["mvy"][y, x]))
                if umv == o["mv"]:
                    mveq += 1
                worst.append((abs(uc - oc), (y, x), oc, uc, o["mv"], umv))
            worst.sort(reverse=True)
            deq = sorted(uc - oc for _, _, oc, uc, omv, umv in worst
                         if omv == umv)
            if deq:
                qs = [deq[int(q * (len(deq) - 1))]
                      for q in (0, 0.25, 0.5, 0.75, 1.0)]
                print(f"   lowres Δ(ours-oracle) among mv-eq: "
                      f"quartiles {qs}, mean {sum(deq)/len(deq):.1f}")
            print(f"   lowres: cost sum oracle {ocost_sum} ours "
                  f"{ucost_sum}, mv eq {mveq}/{len(ol)}")
            for d, (y, x), oc, uc, omv, umv in worst[:6]:
                print(f"     low({y},{x}) oracle {oc}@{omv} "
                      f"ours {uc}@{umv}")
            oworse = sorted(((uc - oc, (y, x), oc, uc, omv, umv)
                             for _, (y, x), oc, uc, omv, umv in worst),
                            reverse=True)
            for d, (y, x), oc, uc, omv, umv in oworse[:6]:
                if d <= 0:
                    break
                print(f"     OURS-WORSE low({y},{x}) oracle {oc}@{omv} "
                      f"ours {uc}@{umv}")
        if args.verbose:
            shown = 0
            for y in range(mb_h):
                for x in range(mb_w):
                    o = om["mb"][(y, x)]
                    ocls = ORACLE_CLASS.get(o["t"], -1)
                    ucls = int(um["mb_types"][y, x])
                    if ocls != ucls and shown < 20:
                        shown += 1
                        print(f"     ({y},{x}) oracle {CLASS_NAMES[ocls]} "
                              f"cbp {o['cbp']:#x} mv {o['mv']} "
                              f"ref {o['ref']} | ours {CLASS_NAMES[ucls]}")


if __name__ == "__main__":
    main()
