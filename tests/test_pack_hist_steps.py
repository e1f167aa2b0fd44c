"""pack_sequences / ImageHistogram / traj_step_stats vs brute-force
references on randomized fixed-seed inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_pack(texts, seq_len):
    """Reference packing: walk docs in id order, append token runs to an
    explicit global tape, record every (doc, seq, offset, len) overlap."""
    out, pos = [], 0
    for doc_id, t in enumerate(texts):
        n = len(t.split())
        if n == 0:
            pos += n
            continue
        left = n
        while left > 0:
            seq = pos // seq_len
            take = min(left, (seq + 1) * seq_len - pos)
            out.append((doc_id, seq, pos - seq * seq_len, take))
            pos += take
            left -= take
    return out


def test_pack_sequences_vs_brute(ray_session):
    import ray
    from gtfs_conflation_pipeline_ray.stages import textops

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta"]
    texts = [" ".join(rng.choice(words, size=rng.integers(0, 40)))
             for _ in range(200)]  # includes empty docs
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(200), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    # chunk=16 forces many chunks; seq_len=32 forces many splits
    got = textops.pack_sequences(ds, seq_len=32, chunk=16).to_pandas()
    got_t = sorted(map(tuple, got[["doc_id", "seq_id", "tok_start",
                                   "n_toks"]].astype(int).to_numpy()))
    assert got_t == sorted(_brute_pack(texts, 32))
    # packing invariants: every sequence except the last is exactly full
    per_seq = got.groupby("seq_id")["n_toks"].sum()
    assert (per_seq.iloc[:-1] == 32).all()
    total = sum(len(t.split()) for t in texts)
    assert per_seq.sum() == total


def test_image_histogram_vs_numpy(ray_session):
    import ray
    from gtfs_conflation_pipeline_ray.functions import codecs
    from gtfs_conflation_pipeline_ray.stages import media

    rng = np.random.default_rng(5)
    blobs, fmts, decoded = [], [], []
    for i, fmt in enumerate(["bmp", "png", "jpeg", "png"]):
        img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
        blobs.append(codecs.encode(img, fmt))
        fmts.append(fmt)
        decoded.append(codecs.decode(blobs[-1], fmt))
    ds = ray.data.from_arrow(pa.table({
        "image_id": pa.array(range(4), type=pa.int64()),
        "bytes": pa.array(blobs, type=pa.binary()),
        "fmt": pa.array(fmts, type=pa.string()),
    }))
    got = media.image_histogram(ds, batch_size=2).to_pandas()
    for i, img in enumerate(decoded):
        for c in range(3):
            exp = np.bincount(img[:, :, c].ravel() // 32, minlength=8)
            sub = got[(got.image_id == i) & (got.channel == c)]
            assert dict(zip(sub.bin, sub.n)) == {
                b: int(v) for b, v in enumerate(exp) if v}


def test_traj_step_stats_vs_brute(ray_session):
    import ray
    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(9)
    rows = []
    for traj in range(5):
        n = int(rng.integers(1, 30))  # includes a possible 1-point traj
        x = y = 0
        for seq in range(n):
            x += int(rng.integers(-80, 81))
            y += int(rng.integers(-80, 81))
            rows.append((traj, seq, x, y))
    df = pd.DataFrame(rows, columns=["traj", "seq", "x", "y"])
    got = spatial.traj_step_stats(
        ray.data.from_pandas(df), "traj", "seq", "x", "y",
        jump=50).to_pandas().set_index("traj").sort_index()

    for traj, g in df.groupby("traj"):
        g = g.sort_values("seq")
        dx = np.abs(np.diff(g.x.to_numpy()))
        dy = np.abs(np.diff(g.y.to_numpy()))
        step = np.maximum(dx, dy)
        r = got.loc[traj]
        assert r.n_pts == len(g)
        assert r.path_len == step.sum()
        assert r.max_step == (step.max() if len(step) else 0)
        assert r.n_jumps == int((step > 50).sum())


def test_decontaminate_vs_brute(ray_session):
    import ray
    from gtfs_conflation_pipeline_ray.stages import textops

    rng = np.random.default_rng(21)
    words = ["w%d" % k for k in range(12)]
    bench_texts = [" ".join(rng.choice(words, size=20)) for _ in range(3)]
    train_texts = [" ".join(rng.choice(words, size=rng.integers(0, 30)))
                   for _ in range(30)]
    # plant a verbatim benchmark span inside one training doc
    train_texts[7] = "x y " + " ".join(bench_texts[0].split()[3:11]) + " z"

    bench = ray.data.from_arrow(pa.table({"text": bench_texts}))
    train = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(30), type=pa.int64()),
        "text": pa.array(train_texts, type=pa.string())}))
    got = textops.decontaminate(train, bench, n=5).to_pandas()
    got = got.set_index("doc_id")

    bset = set()
    for t in bench_texts:
        tk = t.split()
        bset.update(" ".join(tk[i:i + 5]) for i in range(len(tk) - 4))
    for d, t in enumerate(train_texts):
        tk = t.split()
        gs = [" ".join(tk[i:i + 5]) for i in range(len(tk) - 4)]
        if not gs:
            assert d not in got.index
            continue
        assert got.loc[d, "n_ngrams"] == len(gs)
        assert got.loc[d, "n_contaminated"] == sum(g in bset for g in gs)
    # the planted span must register: 8 tokens -> 4 contaminated 5-grams
    assert got.loc[7, "n_contaminated"] >= 4
