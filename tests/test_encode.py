import numpy as np
import jax.numpy as jnp

from mini_parallel_tpu.ops import encode


def test_pad_batch_shapes_and_lengths():
    arr, lens = encode.pad_batch(["ACGT", "AC", "ACGTACGT"])
    assert arr.shape == (3, 8)
    assert lens.tolist() == [4, 2, 8]
    assert bytes(arr[0, :4]) == b"ACGT"
    assert (arr[1, 2:] == encode.PAD_A).all()


def test_pad_batch_bucket():
    arr, _ = encode.pad_batch(["ACG"], pad_to=16)
    assert arr.shape == (1, 16)


def test_ascii_to_code_roundtrip():
    arr, _ = encode.pad_batch(["ACGTNacgtn"])
    codes = np.asarray(encode.ascii_to_code(jnp.asarray(arr)))
    assert codes[0, :10].tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    # pads map to distinct code pads
    a = np.full((1, 2), encode.PAD_A, np.uint8)
    b = np.full((1, 2), encode.PAD_B, np.uint8)
    assert (np.asarray(encode.ascii_to_code(jnp.asarray(a))) == encode.CODE_PAD_A).all()
    assert (np.asarray(encode.ascii_to_code(jnp.asarray(b))) == encode.CODE_PAD_B).all()


def test_complement_and_revcomp():
    arr, _ = encode.pad_batch(["ACGTN"])
    comp = np.asarray(encode.complement_ascii(jnp.asarray(arr)))
    assert bytes(comp[0, :5]) == b"TGCAN"
    rc = np.asarray(encode.reverse_complement_ascii(jnp.asarray(arr[:, :5])))
    assert bytes(rc[0]) == b"NACGT"


def test_complement_code_involution():
    codes = jnp.asarray(np.arange(7, dtype=np.uint8)[None])
    twice = np.asarray(encode.complement_code(encode.complement_code(codes)))
    assert (twice == np.arange(7)).all()
