"""Wave-9 kernels: trajectory grid resampling + BPE pair-count merge round."""

import collections

import numpy as np
import pyarrow as pa


def test_traj_resample_vs_brute(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(21)
    rows = []
    for traj in range(6):
        s = np.unique(rng.integers(0, 120, size=int(rng.integers(1, 25))))
        x = rng.integers(-500, 500, size=len(s))
        y = rng.integers(-500, 500, size=len(s))
        rows += [(traj, int(a), int(b), int(c)) for a, b, c in zip(s, x, y)]
    tab = pa.table({
        "traj": np.array([r[0] for r in rows], np.int64),
        "seq": np.array([r[1] for r in rows], np.int64),
        "x": np.array([r[2] for r in rows], np.int64),
        "y": np.array([r[3] for r in rows], np.int64),
    })
    ds = ray.data.from_arrow(tab)
    got = spatial.traj_resample(ds, "traj", "seq", "x", "y", step=8)
    got = {(r.traj, r.t): (r.x_i, r.y_i)
           for r in got.to_pandas().itertuples()}

    want = {}
    by_traj = collections.defaultdict(list)
    for traj, s, x, y in rows:
        by_traj[traj].append((s, x, y))
    for traj, obs in by_traj.items():
        obs.sort()
        s = np.array([o[0] for o in obs])
        for t in range(0, 121, 8):
            if t < s[0] or t > s[-1]:
                continue
            i = int(np.searchsorted(s, t, side="right")) - 1
            if s[i] == t:
                want[(traj, t)] = (obs[i][1], obs[i][2])
            else:
                s0, x0, y0 = obs[i]
                s1, x1, y1 = obs[i + 1]
                want[(traj, t)] = (x0 + (x1 - x0) * (t - s0) // (s1 - s0),
                                   y0 + (y1 - y0) * (t - s0) // (s1 - s0))
    assert got == want


def test_bpe_pair_topk_vs_counter(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.functions.text import _WORD_ASCII_RE
    from gtfs_conflation_pipeline_ray.stages.textops import bpe_pair_topk

    rng = np.random.default_rng(2)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
             for _ in range(80)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    got = bpe_pair_topk(ds, k=10).to_pydict()

    cnt = collections.Counter()
    for t in texts:
        ws = _WORD_ASCII_RE.findall(t.lower())
        cnt.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["pair"], got["n"])) == want
