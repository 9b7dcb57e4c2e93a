#!/usr/bin/env python
"""Measure TRUE device HBM cost of representative array shapes.

Settles the tile-padding question behind the 216^3 OOM (VERDICT r3
item 1a): does the axon TPU runtime pad small sublane counts to the
native (8,128)/(16,128)/(32,128) tiles in HBM?  nbytes accounting
said the static side is ~10.2 GB; if sublane padding is real, planar
(W, N) arrays with W < tile cost up to 8x their logical bytes and the
meta-packing refactor (ops/tiled.py fold_meta) is worth far more.

Method: device.memory_stats()["bytes_in_use"] delta around jax.device_put
of each probe shape.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/hbm_true.py
"""
import numpy as np


def main():
    import jax

    dev = jax.devices()[0]
    N = 1 << 22          # 4M lanes — big enough to dwarf allocator noise

    def used():
        s = dev.memory_stats()
        return s["bytes_in_use"]

    probes = [
        ("(4,N) f32 planar", np.zeros((4, N), np.float32)),
        ("(8,N) f32 planar", np.zeros((8, N), np.float32)),
        ("(4,N) i16 codes", np.zeros((4, N), np.int16)),
        ("(16,N) i16 codes", np.zeros((16, N), np.int16)),
        ("(2,N) i16", np.zeros((2, N), np.int16)),
        ("(N,4) i32 table", np.zeros((N, 4), np.int32)),
        ("(N,2) i32 edges", np.zeros((N, 2), np.int32)),
        ("(N,6) i32 table", np.zeros((N, 6), np.int32)),
        ("(N,) bool", np.zeros((N,), np.bool_)),
        ("(N,4) bool mask", np.zeros((N, 4), np.bool_)),
        ("(1,N) f32", np.zeros((1, N), np.float32)),
        ("(N,) f32", np.zeros((N,), np.float32)),
        ("(N,3) f32 pts", np.zeros((N, 3), np.float32)),
    ]
    keep = []
    base = used()
    for name, arr in probes:
        before = used()
        d = jax.device_put(arr, dev)
        d.block_until_ready()
        keep.append(d)
        after = used()
        ratio = (after - before) / max(arr.nbytes, 1)
        print(f"{name:<22} nbytes={arr.nbytes/2**20:8.2f}MB "
              f"device={(after-before)/2**20:8.2f}MB  x{ratio:.2f}")
    print(f"total delta {(used()-base)/2**30:.3f} GB")


if __name__ == "__main__":
    main()
