"""largeNbDicts benchmark analog
(/root/reference/contrib/largeNbDicts/largeNbDicts.c): measure decompression
throughput when every blob uses a DIFFERENT dictionary — the cold-dictionary
regime of sharded key-value stores, where per-op DDict setup cost dominates.

Usage: python tools/large_nb_dicts.py [--nb-dicts 64] [--blob-size 4096]
Prints one JSON line with cold vs warm (single shared dict) MB/s.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb-dicts", type=int, default=64)
    ap.add_argument("--blob-size", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from tests.conftest import gen_text
    from zstd_tpu.dict_builder.fastcover import train_from_samples
    from zstd_tpu.dict_builder.zdict import finalize_dictionary
    from zstd_tpu.dictionary import (compress_with_dict,
                                     decompress_with_dict, load_dictionary)

    nb = args.nb_dicts
    dicts = []
    blobs = []
    total = 0
    for i in range(nb):
        samples = [gen_text(args.blob_size, seed=1000 * i + j)
                   for j in range(8)]
        raw = train_from_samples(samples, max_dict_size=2048, k=256)
        dbytes = finalize_dictionary(raw, samples, dict_id=i + 1, level=3)
        data = gen_text(args.blob_size, seed=1000 * i + 99)
        d = load_dictionary(dbytes)
        blobs.append((dbytes, compress_with_dict(data, d, level=3), data))
        total += args.blob_size

    # cold: re-digest the dictionary per op (largeNbDicts' regime)
    t_cold = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        for dbytes, blob, data in blobs:
            d = load_dictionary(dbytes)
            assert decompress_with_dict(blob, d) == data
        t_cold = min(t_cold, time.time() - t0)

    # warm: dictionaries digested once
    digested = [load_dictionary(db) for db, _, _ in blobs]
    t_warm = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        for d, (_, blob, data) in zip(digested, blobs):
            assert decompress_with_dict(blob, d) == data
        t_warm = min(t_warm, time.time() - t0)

    print(json.dumps({
        "metric": "large_nb_dicts_decompress",
        "nb_dicts": nb,
        "cold_mbps": round(total / t_cold / 1e6, 2),
        "warm_mbps": round(total / t_warm / 1e6, 2),
        "ddict_setup_overhead": round(t_cold / t_warm, 2),
    }))


if __name__ == "__main__":
    main()
