"""Native Kaldi ark/scp readers (no kaldi-io-for-python dependency).

Parity target: the subset of ``kaldi_io`` the reference uses —
``read_vec_int_ark`` for alignment labels (reference
``dataio/dataio.py:747`` read_kaldi_lab) plus float vector/matrix ark
and scp readers for feature interop.  Formats follow the public Kaldi
table spec: each record is ``key<space>`` then either a binary blob
(``\\0B`` marker) or a text row.

Write support covers float matrices/vectors (binary), enough to
round-trip features between this framework and Kaldi tooling.
"""

import struct

import numpy as np

__all__ = [
    "read_vec_int_ark",
    "read_vec_flt_ark",
    "read_mat_ark",
    "read_mat_scp",
    "read_mat",
    "write_mat",
    "write_vec_flt",
]


def _read_key(fd):
    """Read a whitespace-terminated token; '' at EOF."""
    chars = []
    while True:
        c = fd.read(1)
        if c == b"" or c in (b" ", b"\t", b"\n"):
            break
        chars.append(c)
    return b"".join(chars).decode("latin1")


def _peek(fd, n):
    pos = fd.tell()
    data = fd.read(n)
    fd.seek(pos)
    return data


def _read_vec_int(fd):
    if _peek(fd, 2) == b"\0B":
        fd.read(2)
        assert fd.read(1) == b"\4"
        (n,) = struct.unpack("<i", fd.read(4))
        if n == 0:
            return np.zeros(0, np.int32)
        # Each element: 1-byte size tag (4) + int32.
        buf = fd.read(n * 5)
        arr = np.frombuffer(
            buf, dtype=[("size", "i1"), ("value", "<i4")], count=n
        )
        return arr["value"].astype(np.int32)
    # Text: integers to end of line, optionally bracketed.
    line = fd.readline().decode("latin1")
    toks = [t for t in line.replace("[", " ").replace("]", " ").split()]
    return np.asarray([int(t) for t in toks], np.int32)


def _read_vec_flt(fd):
    if _peek(fd, 2) == b"\0B":
        fd.read(2)
        token = _read_key(fd)
        dtype = {"FV": "<f4", "DV": "<f8"}.get(token)
        if dtype is None:
            raise ValueError(f"Unsupported vector type {token!r}")
        assert fd.read(1) == b"\4"
        (n,) = struct.unpack("<i", fd.read(4))
        return np.frombuffer(
            fd.read(n * np.dtype(dtype).itemsize), dtype=dtype, count=n
        ).astype(np.float32)
    line = fd.readline().decode("latin1")
    toks = line.replace("[", " ").replace("]", " ").split()
    return np.asarray([float(t) for t in toks], np.float32)


def _read_mat(fd):
    if _peek(fd, 2) == b"\0B":
        fd.read(2)
        token = _read_key(fd)
        dtype = {"FM": "<f4", "DM": "<f8"}.get(token)
        if dtype is None:
            raise ValueError(
                f"Unsupported matrix type {token!r} "
                "(compressed 'CM' matrices not supported)"
            )
        assert fd.read(1) == b"\4"
        (rows,) = struct.unpack("<i", fd.read(4))
        assert fd.read(1) == b"\4"
        (cols,) = struct.unpack("<i", fd.read(4))
        n = rows * cols
        mat = np.frombuffer(
            fd.read(n * np.dtype(dtype).itemsize), dtype=dtype, count=n
        )
        return mat.reshape(rows, cols).astype(np.float32)
    # Text matrix: "[\n r1\n r2 ... ]"
    rows = []
    first = fd.readline().decode("latin1")
    assert "[" in first
    while True:
        line = fd.readline().decode("latin1")
        if not line:
            break
        done = "]" in line
        toks = line.replace("]", " ").split()
        if toks:
            rows.append([float(t) for t in toks])
        if done:
            break
    return np.asarray(rows, np.float32)


def _ark_records(path_or_fd, value_reader):
    own = isinstance(path_or_fd, str)
    fd = open(path_or_fd, "rb") if own else path_or_fd
    try:
        while True:
            key = _read_key(fd)
            if not key:
                break
            yield key, value_reader(fd)
    finally:
        if own:
            fd.close()


def read_vec_int_ark(path_or_fd):
    """Yield (key, int32 vector) from an ark file or stream.

    Example
    -------
    >>> import io, struct
    >>> buf = io.BytesIO()
    >>> _ = buf.write(b"utt1 \\0B\\4" + struct.pack("<i", 2)
    ...     + b"\\4" + struct.pack("<i", 7) + b"\\4" + struct.pack("<i", 9))
    >>> _ = buf.seek(0)
    >>> [(k, v.tolist()) for k, v in read_vec_int_ark(buf)]
    [('utt1', [7, 9])]
    """
    return _ark_records(path_or_fd, _read_vec_int)


def read_vec_flt_ark(path_or_fd):
    """Yield (key, float32 vector) from an ark file or stream."""
    return _ark_records(path_or_fd, _read_vec_flt)


def read_mat_ark(path_or_fd):
    """Yield (key, float32 matrix) from an ark file or stream."""
    return _ark_records(path_or_fd, _read_mat)


def read_mat(path_with_offset):
    """Read one matrix given ``path:offset`` (scp entry) or a path."""
    if ":" in path_with_offset and path_with_offset.rsplit(":", 1)[1].isdigit():
        path, offset = path_with_offset.rsplit(":", 1)
        with open(path, "rb") as fd:
            fd.seek(int(offset))
            return _read_mat(fd)
    with open(path_with_offset, "rb") as fd:
        _read_key(fd)  # skip key if present
        return _read_mat(fd)


def read_mat_scp(path_or_fd):
    """Yield (key, matrix) for each ``key path:offset`` scp line."""
    own = isinstance(path_or_fd, str)
    fd = open(path_or_fd, "r") if own else path_or_fd
    try:
        for line in fd:
            parts = line.split()
            if len(parts) != 2:
                continue
            yield parts[0], read_mat(parts[1])
    finally:
        if own:
            fd.close()


def write_mat(fd_or_path, mat, key):
    """Append one float32 matrix in binary ark format.

    Example
    -------
    >>> import io
    >>> buf = io.BytesIO()
    >>> write_mat(buf, np.arange(6, dtype=np.float32).reshape(2, 3), "u1")
    >>> _ = buf.seek(0)
    >>> k, m = next(read_mat_ark(buf))
    >>> k, m.shape
    ('u1', (2, 3))
    """
    own = isinstance(fd_or_path, str)
    fd = open(fd_or_path, "ab") if own else fd_or_path
    try:
        mat = np.ascontiguousarray(mat, dtype="<f4")
        fd.write(key.encode("latin1") + b" \0BFM ")
        fd.write(b"\4" + struct.pack("<i", mat.shape[0]))
        fd.write(b"\4" + struct.pack("<i", mat.shape[1]))
        fd.write(mat.tobytes())
    finally:
        if own:
            fd.close()


def write_vec_flt(fd_or_path, vec, key):
    """Append one float32 vector in binary ark format."""
    own = isinstance(fd_or_path, str)
    fd = open(fd_or_path, "ab") if own else fd_or_path
    try:
        vec = np.ascontiguousarray(vec, dtype="<f4")
        fd.write(key.encode("latin1") + b" \0BFV ")
        fd.write(b"\4" + struct.pack("<i", vec.shape[0]))
        fd.write(vec.tobytes())
    finally:
        if own:
            fd.close()
