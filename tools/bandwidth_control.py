"""Bare-numpy scaling control (no Spark): measures the MACHINE's parallel
ceiling for this engine's memory-streaming hash kernels.

Runs K independent processes, each looping the batch shingle/minhash kernels
over its own synthetic batch, and reports per-process and aggregate
throughput.  If K→4K aggregate efficiency is far below 1.0 here, the box —
not the Spark engine — caps the same ratio measured through bench_scaling
(single-socket DRAM bandwidth, possibly shared with noisy neighbors; CPU
steal stays near zero because the stall is in the memory system).

Usage: python tools/bandwidth_control.py [K ...]   (default: 2 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _worker(seconds: float, q) -> None:
    import numpy as np
    import pandas as pd

    from camden_spark.functions.hashing import (
        batch_shingle_hashes,
        minhash_flat,
        simhash_flat,
    )

    rng = np.random.RandomState(0)
    vocab = [f"tok{i}" for i in range(2000)]
    texts = pd.Series(
        [
            " ".join(vocab[j] for j in rng.randint(0, 2000, 200))
            for _ in range(512)
        ],
        dtype="object",
    )
    docs = 0
    t_end = time.time() + seconds
    while time.time() < t_end:
        flat, counts = batch_shingle_hashes(texts, 5)
        minhash_flat(flat, counts, 128, 42)
        simhash_flat(flat, counts)
        docs += len(texts)
    q.put(docs)


def measure(k: int, seconds: float = 20.0) -> dict:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(seconds, q)) for _ in range(k)]
    t0 = time.time()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    wall = time.time() - t0
    per = [q.get() for _ in procs]
    total_rate = sum(per) / seconds
    return {
        "k": k,
        "wall": round(wall, 1),
        "docs_per_sec_total": round(total_rate, 1),
        "docs_per_sec_per_proc": round(total_rate / k, 1),
    }


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [2, 8, 32]
    out = [measure(k) for k in ks]
    for lo, hi in zip(out, out[1:]):
        ratio = hi["docs_per_sec_total"] / lo["docs_per_sec_total"]
        eff = ratio / (hi["k"] / lo["k"])
        print(
            f"{lo['k']}→{hi['k']} procs: aggregate ×{ratio:.2f}, "
            f"efficiency {eff:.3f}"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
