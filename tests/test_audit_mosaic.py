"""Pure-host pieces of the compiled-artifact op auditor
(tools/audit_mosaic.py): vreg padding arithmetic and op classification.
The capture/count path itself needs a TPU lowering target and is
exercised by ``bench.py`` on hardware (its result is recorded in
BENCH_headline_r05.json with provenance)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))

from audit_mosaic import (ALU_OPS, MOVE_OPS, Counts, _elem_bits,
                          _padded_elems, _vec_shape)


def test_vec_shape_parsing():
    assert _vec_shape("vector<256x256xi32>") == (256, 256)
    assert _vec_shape("vector<8x128xi16>") == (8, 128)
    assert _vec_shape("vector<128xi32>") == (128,)
    assert _vec_shape("i32") is None


def test_elem_bits():
    assert _elem_bits("vector<8x128xi32>") == 32
    assert _elem_bits("vector<16x128xi16>") == 16
    assert _elem_bits("i8") == 8


def test_padded_elems_tile_alignment():
    # int32 native tile is (8, 128): aligned shapes pad to themselves
    assert _padded_elems((8, 128), 32) == 8 * 128
    assert _padded_elems((256, 256), 32) == 256 * 256
    # sub-tile shapes pad UP to whole vregs
    assert _padded_elems((1, 128), 32) == 8 * 128      # 8x sublane waste
    assert _padded_elems((8, 64), 32) == 8 * 128       # 2x lane waste
    # int16 packs two sublanes per vreg row: tile is (16, 128)
    assert _padded_elems((16, 128), 16) == 16 * 128
    assert _padded_elems((8, 128), 16) == 16 * 128     # half-full vreg
    # leading dims multiply; minor two pad
    assert _padded_elems((3, 4, 128), 32) == 3 * 8 * 128
    # 1-D vectors pad to 128-lane multiples
    assert _padded_elems((130,), 32) == 2 * 8 * 128
    assert _padded_elems((), 32) == 1


def test_counts_accumulation():
    c = Counts()
    c.add("alu", "arith.addi", 100, 128, 2)
    c.add("alu", "arith.addi", 50, 64, 1)
    c.add("alu", "arith.muli", 10, 10, 1)
    assert c.total("alu", 0) == 100 * 2 + 50 + 10      # elems
    assert c.total("alu", 1) == 128 * 2 + 64 + 10      # padded
    assert c["alu"]["arith.addi"][2] == 3              # op count


def test_classification_sets_disjoint():
    assert not (ALU_OPS & MOVE_OPS)
