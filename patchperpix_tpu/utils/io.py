"""Uniform volume I/O over zarr (via tensorstore) and HDF5.

Replaces the reference's IoZarr/IoHDF5 classes (vote_instances/io_hdflike.py:
26-154) and the halo-aware block reader (stitch_patch_graph.py:443-513).
Zarr goes through tensorstore, which doubles as the streaming layer for
volumes larger than HBM.
"""

from __future__ import annotations

import json
import os

import numpy as np

try:
    import tensorstore as ts
except ImportError:  # pragma: no cover
    ts = None

import h5py


def _zarr_spec(path: str, key: str, create: bool = False, **kwargs) -> dict:
    spec = {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": os.path.join(path, key)},
    }
    if create:
        spec["metadata"] = kwargs
    return spec


class IoZarr:
    """read(bb, key) / write(arr, bb, key) on a zarr store via tensorstore.

    ``channel_order`` maps several logical keys onto channel ranges of one
    stacked array (io_hdflike.py:26-60 semantics).
    """

    def __init__(self, path: str, keys=None, mode: str = "r",
                 channel_order=None):
        self.path = path
        self.keys = [keys] if isinstance(keys, str) else (keys or [])
        self.mode = mode
        self.channel_order = channel_order
        self._arrays: dict = {}

    def _open(self, key: str):
        if key not in self._arrays:
            try:
                self._arrays[key] = ts.open(
                    _zarr_spec(self.path, key),
                    read=True, write=(self.mode != "r")).result()
            except Exception as e:  # normalize missing-dataset to KeyError
                if "NOT_FOUND" in str(e) and self.mode == "r":
                    raise KeyError(key) from e
                raise
        return self._arrays[key]

    def shape(self, key: str):
        return tuple(self._open(key).shape)

    def dtype(self, key: str):
        return np.dtype(self._open(key).dtype.name)

    def read(self, bb=None, key: str | None = None) -> np.ndarray:
        key = key or self.keys[0]
        if self.channel_order is not None and key in self.channel_order:
            ch = self.channel_order[key]
            base = self._open(self.keys[0])
            spatial_bb = tuple(bb) if bb else ()
            if spatial_bb and len(spatial_bb) == len(base.shape):
                spatial_bb = spatial_bb[1:]  # caller included channel dim
            sl = (slice(ch[0], ch[1]),) + spatial_bb
            return np.asarray(base[sl].read().result())
        arr = self._open(key)
        if bb is None:
            return np.asarray(arr.read().result())
        return np.asarray(arr[tuple(bb)].read().result())

    def write(self, out: np.ndarray, bb=None, key: str | None = None):
        key = key or self.keys[0]
        arr = self._open(key)
        if bb is None:
            arr[...] = out
        else:
            arr[tuple(bb)] = out

    def create(self, key: str, shape, dtype, chunks=None,
               fill_value=0, compressor="blosc"):
        metadata = {
            "shape": list(shape),
            "dtype": np.dtype(dtype).str,
            "fill_value": fill_value,
        }
        if chunks is not None:
            metadata["chunks"] = list(chunks)
        if compressor == "blosc":
            metadata["compressor"] = {
                "id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 2}
        elif compressor is None:
            metadata["compressor"] = None
        spec = _zarr_spec(self.path, key)
        spec["metadata"] = metadata
        self._arrays[key] = ts.open(
            spec, create=True, delete_existing=True, write=True,
            read=True).result()
        return self._arrays[key]

    def set_attrs(self, key: str, attrs: dict):
        p = os.path.join(self.path, key, ".zattrs")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            json.dump(attrs, f)

    def close(self):
        self._arrays.clear()

    def list_keys(self, prefix: str = "") -> list[str]:
        """Keys (arrays) under a group prefix, by .zarray presence."""
        root = os.path.join(self.path, prefix)
        out = []
        for dirpath, _dirnames, filenames in os.walk(root):
            if ".zarray" in filenames:
                out.append(os.path.relpath(dirpath, self.path))
        return sorted(out)


class IoHDF5:
    """read/write on an HDF5 file (io_hdflike.py:63-120 semantics)."""

    def __init__(self, path: str, keys=None, mode: str = "r",
                 channel_order=None):
        self.path = path
        self.keys = [keys] if isinstance(keys, str) else (keys or [])
        self.mode = mode
        self.channel_order = channel_order
        self._f = h5py.File(path, mode)

    def shape(self, key: str):
        return self._f[key].shape

    def dtype(self, key: str):
        return self._f[key].dtype

    def read(self, bb=None, key: str | None = None) -> np.ndarray:
        key = key or self.keys[0]
        if self.channel_order is not None and key in self.channel_order:
            ch = self.channel_order[key]
            base = self._f[self.keys[0]]
            spatial_bb = tuple(bb) if bb else ()
            if spatial_bb and len(spatial_bb) == len(base.shape):
                spatial_bb = spatial_bb[1:]  # caller included channel dim
            sl = (slice(ch[0], ch[1]),) + spatial_bb
            return np.asarray(base[sl])
        ds = self._f[key]
        return np.asarray(ds[tuple(bb)] if bb is not None else ds[()])

    def write(self, out: np.ndarray, bb=None, key: str | None = None,
              compression="gzip", attrs=None):
        key = key or self.keys[0]
        if key in self._f and bb is None \
                and self._f[key].shape != np.shape(out):
            del self._f[key]  # full rewrite with a different shape
        if key not in self._f:
            if bb is not None:
                raise ValueError("create dataset before windowed writes")
            ds = self._f.create_dataset(key, data=out,
                                        compression=compression)
        else:
            ds = self._f[key]
            if bb is None:
                ds[...] = out
            else:
                ds[tuple(bb)] = out
        if attrs:
            for k, v in attrs.items():
                ds.attrs[k] = v

    def create(self, key: str, shape, dtype, chunks=None, **_):
        if key in self._f:
            del self._f[key]
        return self._f.create_dataset(key, shape=shape, dtype=dtype,
                                      chunks=tuple(chunks) if chunks else None,
                                      compression="gzip")

    def close(self):
        self._f.close()


def open_volume(path: str, keys=None, mode: str = "r", channel_order=None):
    """Dispatch on extension (.zarr dir vs .hdf/.h5 file)."""
    if str(path).endswith(".zarr"):
        return IoZarr(path, keys, mode, channel_order)
    if str(path).endswith((".hdf", ".h5", ".hdf5")):
        return IoHDF5(path, keys, mode, channel_order)
    raise ValueError(f"unsupported volume format: {path}")


def load_input(io, key: str, offset, block_shape, context,
               pad_value=0.0, channel_dim: bool = True) -> np.ndarray:
    """Block read with halo margins and boundary padding
    (stitch_patch_graph.py:443-513).

    Reads ``block_shape`` voxels at ``offset`` plus ``context`` margin on each
    side; out-of-volume parts are constant-padded.
    """
    shape = io.shape(key)
    spatial = np.array(shape[1:] if channel_dim else shape)
    offset = np.asarray(offset)
    block_shape = np.asarray(block_shape)
    context = np.asarray(context)

    want_start = offset - context
    want_stop = offset + block_shape + context
    read_start = np.maximum(want_start, 0)
    read_stop = np.minimum(want_stop, spatial)
    bb = tuple(slice(int(s), int(e)) for s, e in zip(read_start, read_stop))
    if channel_dim:
        bb = (slice(None),) + bb
    data = io.read(bb=bb, key=key)

    pad = [(int(rs - ws), int(we - re))
           for ws, rs, re, we in zip(want_start, read_start,
                                     read_stop, want_stop)]
    if channel_dim:
        pad = [(0, 0)] + pad
    if any(p != (0, 0) for p in pad):
        data = np.pad(data, pad, mode="constant", constant_values=pad_value)
    return data


def check_file(path: str, keys=None, remove_on_error: bool = False) -> bool:
    """Integrity probe: file exists and the given keys are readable
    (run_ppp.py:69-92).  Broken files are optionally deleted so stages
    recompute them (restart + skip-completed recovery)."""
    import shutil

    if not os.path.exists(path):
        return False
    try:
        io = open_volume(path, mode="r")
    except Exception:
        # unopenable = corrupt -> optionally delete so the stage reruns
        if remove_on_error:
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            else:
                os.remove(path)
        return False
    try:
        if keys:
            for k in ([keys] if isinstance(keys, str) else keys):
                try:
                    s = io.shape(k)
                except KeyError:
                    # readable file, key simply absent (e.g. another param
                    # set's res_key not written yet) -> incomplete, but NOT
                    # corrupt: keep the file and its other keys
                    return False
                # touch one element (every dim sliced: s[1:] left the
                # last axis fully read, decompressing many chunks)
                io.read(bb=tuple(slice(0, 1) for _ in s), key=k)
        return True
    except Exception:
        if remove_on_error:
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            else:
                os.remove(path)
        return False
    finally:
        try:
            io.close()
        except Exception:
            pass


def save_tif(path: str, arr: np.ndarray) -> str:
    """TIF export (PIL backend) for label/MIP dumps — 2D or multipage 3D
    (the reference writes cleaned uint16 label volumes as tif via
    tifffile, stitch_patch_graph.py:836-841, and float32 patch mosaics,
    visualize/patches.py:196-198)."""
    from PIL import Image

    arr = np.asarray(arr)
    arr = np.squeeze(arr)
    if np.issubdtype(arr.dtype, np.integer) or arr.dtype == bool:
        arr = arr.astype(np.uint16)
    else:
        arr = arr.astype(np.float32)
    if arr.ndim == 2:
        Image.fromarray(arr).save(path)
    elif arr.ndim == 3:
        frames = [Image.fromarray(arr[z]) for z in range(arr.shape[0])]
        frames[0].save(path, save_all=True, append_images=frames[1:])
    else:
        raise ValueError(f"save_tif: unsupported ndim {arr.ndim}")
    return path


def read_tif(path: str) -> np.ndarray:
    """Reader for save_tif output (2D single-page or 3D multipage)."""
    from PIL import Image, ImageSequence

    with Image.open(path) as img:
        frames = [np.asarray(f.copy()) for f in
                  ImageSequence.Iterator(img)]
    return frames[0] if len(frames) == 1 else np.stack(frames)


def write_nrrd(path: str, arr: np.ndarray):
    """Minimal NRRD writer (raw encoding) for skeleton exports
    (util/postprocess.py:110-119 uses the external nrrd package, not
    installed here; the format is a text header + raw little-endian data).
    """
    arr = np.ascontiguousarray(arr)
    type_map = {np.dtype(np.uint8): "uint8", np.dtype(np.uint16): "uint16",
                np.dtype(np.int32): "int32", np.dtype(np.uint32): "uint32",
                np.dtype(np.int64): "int64", np.dtype(np.uint64): "uint64",
                np.dtype(np.float32): "float",
                np.dtype(np.float64): "double"}
    t = type_map.get(arr.dtype)
    if t is None:
        if np.issubdtype(arr.dtype, np.integer):
            # never round integer labels through float
            arr = arr.astype(np.int64)
            t = "int64"
        else:
            arr = arr.astype(np.float32)
            t = "float"
    # nrrd sizes are fastest-first (Fortran); a C-contiguous array's axes
    # are slowest-first, so list them reversed
    sizes = " ".join(str(s) for s in reversed(arr.shape))
    header = (f"NRRD0004\ntype: {t}\ndimension: {arr.ndim}\n"
              f"sizes: {sizes}\nencoding: raw\nendian: little\n\n")
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(arr.tobytes())


def read_nrrd(path: str) -> np.ndarray:
    """Reader for the minimal raw-encoded NRRD files write_nrrd emits."""
    with open(path, "rb") as f:
        data = f.read()
    head, _, body = data.partition(b"\n\n")
    fields = dict(line.split(": ", 1) for line in
                  head.decode().splitlines()[1:] if ": " in line)
    dt = {"uint8": np.uint8, "uint16": np.uint16, "int32": np.int32,
          "uint32": np.uint32, "int64": np.int64, "uint64": np.uint64,
          "float": np.float32, "double": np.float64}[fields["type"]]
    sizes = [int(s) for s in fields["sizes"].split()]
    return np.frombuffer(body, dtype=dt).reshape(tuple(reversed(sizes)))
