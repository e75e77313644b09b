"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels are STUBS (no image/audio libraries in this
container — task brief): a deterministic fake container format
("SWIM"/"SWAU" headers) exercises the REAL Ray-side plumbing — schema,
actor signature, batch sizing, output layout — and any real payload
raises NotImplementedError into the per-row error column exactly like
a production decode failure would.

Fake container layouts (big-endian):
  image: b"SWIM" + u16 width + u16 height + u8 channels + pixels?
  audio: b"SWAU" + u32 sample_rate + u32 n_samples
"""

from __future__ import annotations

import hashlib
import struct
from typing import Any

import numpy as np
import pyarrow as pa


def synth_image_blob(seed: int, width: int = 32, height: int = 24,
                     channels: int = 3) -> bytes:
    """Deterministic fake image container (for tests/demos)."""
    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, size=width * height * channels,
                         dtype=np.uint8).tobytes()
    return b"SWIM" + struct.pack(">HHB", width, height, channels) + pixels


def synth_audio_blob(seed: int, sample_rate: int = 16000,
                     n_samples: int = 1600) -> bytes:
    rng = np.random.RandomState(seed)
    samples = rng.randint(-(1 << 15), 1 << 15, size=n_samples,
                          dtype=np.int16).tobytes()
    return b"SWAU" + struct.pack(">II", sample_rate, n_samples) + samples


class DecodeImages:
    """Actor-pool decode stage. __init__ is where a real build would
    load the codec/model once per worker; __call__ decodes per batch.

    Output schema (stable regardless of decode success):
      key, width:int32, height:int32, channels:int32,
      feature:list<float> (8-dim content hash embedding), error:string
    """

    FEATURE_DIM = 8

    def __init__(self, key: str = "media_id", col: str = "payload"):
        self.key = key
        self.col = col
        # real build: self.codec = load_image_codec()  (once per actor)

    def _decode(self, blob: bytes):
        if blob[:4] == b"SWIM":
            w, h, c = struct.unpack(">HHB", blob[4:9])
            pixels = np.frombuffer(blob[9:9 + w * h * c], dtype=np.uint8)
            digest = hashlib.blake2b(pixels.tobytes(),
                                     digest_size=self.FEATURE_DIM).digest()
            feat = [b / 255.0 for b in digest]
            return w, h, c, feat, None
        raise NotImplementedError(
            "real image codecs unavailable in this container; only the "
            "SWIM fake container decodes (task brief: decode is stubbed)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pylist()
        blobs = batch.column(self.col).to_pylist()
        w_, h_, c_, f_, e_ = [], [], [], [], []
        for blob in blobs:
            try:
                w, h, c, feat, err = self._decode(blob or b"")
            except Exception as e:
                w = h = c = 0
                feat = [0.0] * self.FEATURE_DIM
                err = f"{type(e).__name__}: {e}"
            w_.append(w)
            h_.append(h)
            c_.append(c)
            f_.append(feat)
            e_.append(err)
        return pa.table({
            self.key: pa.array(keys),
            "width": pa.array(w_, type=pa.int32()),
            "height": pa.array(h_, type=pa.int32()),
            "channels": pa.array(c_, type=pa.int32()),
            "feature": pa.array(f_, type=pa.list_(pa.float32())),
            "error": pa.array(e_, type=pa.string()),
        })


def decode_images(ds: Any, key: str = "media_id", col: str = "payload",
                  concurrency=None, batch_size: int = 32) -> Any:
    """Small batch_size: media blobs are large; batch bytes — not row
    count — must bound worker heap (SURVEY.md §4 memory row)."""
    from ..util import map_batches_stateful
    return map_batches_stateful(
        ds, DecodeImages, fn_constructor_kwargs=dict(key=key, col=col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


class SampleAudioFrames:
    """Frame-sample stage for audio blobs: emits every Nth frame's
    amplitude stats. Same stub discipline as DecodeImages."""

    def __init__(self, every_n: int = 160, key: str = "media_id",
                 col: str = "payload"):
        self.every_n = every_n
        self.key = key
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pylist()
        blobs = batch.column(self.col).to_pylist()
        rates, counts, means, errs = [], [], [], []
        for blob in blobs:
            try:
                if not blob or blob[:4] != b"SWAU":
                    raise NotImplementedError("only SWAU fake audio decodes")
                rate, n = struct.unpack(">II", blob[4:12])
                samples = np.frombuffer(blob[12:12 + 2 * n], dtype=np.int16)
                sampled = samples[::self.every_n]
                rates.append(rate)
                counts.append(len(sampled))
                means.append(float(np.abs(sampled).mean()) if len(sampled)
                             else 0.0)
                errs.append(None)
            except Exception as e:
                rates.append(0)
                counts.append(0)
                means.append(0.0)
                errs.append(f"{type(e).__name__}: {e}")
        return pa.table({
            self.key: pa.array(keys),
            "sample_rate": pa.array(rates, type=pa.int32()),
            "n_frames_sampled": pa.array(counts, type=pa.int32()),
            "mean_abs_amplitude": pa.array(means, type=pa.float64()),
            "error": pa.array(errs, type=pa.string()),
        })


def synth_video_blob(seed: int, width: int = 16, height: int = 12,
                     n_frames: int = 8) -> bytes:
    """Deterministic fake video container:
    b"SWVI" + u16 w + u16 h + u16 n_frames + grayscale frames."""
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, size=width * height * n_frames,
                         dtype=np.uint8).tobytes()
    return b"SWVI" + struct.pack(">HHH", width, height, n_frames) + frames


class SampleVideoFrames:
    """Frame-sample stage for video blobs: decode every Nth frame,
    emit per-sampled-frame mean luminance + a content feature. Same
    stub discipline: only the SWVI fake container decodes; real codecs
    raise into the error column."""

    def __init__(self, every_n: int = 2, key: str = "media_id",
                 col: str = "payload"):
        self.every_n = every_n
        self.key = key
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pylist()
        blobs = batch.column(self.col).to_pylist()
        nfr, sampled, lum, errs = [], [], [], []
        for blob in blobs:
            try:
                if not blob or blob[:4] != b"SWVI":
                    raise NotImplementedError(
                        "real video codecs unavailable; only the SWVI "
                        "fake container decodes (task brief)")
                w, h, n = struct.unpack(">HHH", blob[4:10])
                fsz = w * h
                pix = np.frombuffer(blob[10:10 + fsz * n], dtype=np.uint8)
                frames = pix.reshape(n, fsz)[::self.every_n]
                nfr.append(n)
                sampled.append(frames.shape[0])
                lum.append([float(f.mean()) for f in frames])
                errs.append(None)
            except Exception as e:
                nfr.append(0)
                sampled.append(0)
                lum.append([])
                errs.append(f"{type(e).__name__}: {e}")
        return pa.table({
            self.key: pa.array(keys),
            "n_frames": pa.array(nfr, type=pa.int32()),
            "n_sampled": pa.array(sampled, type=pa.int32()),
            "frame_luminance": pa.array(lum, type=pa.list_(pa.float32())),
            "error": pa.array(errs, type=pa.string()),
        })


def sample_video_frames(ds: Any, every_n: int = 2, key: str = "media_id",
                        col: str = "payload", concurrency=None,
                        batch_size: int = 16) -> Any:
    from ..util import map_batches_stateful
    return map_batches_stateful(
        ds, SampleVideoFrames,
        fn_constructor_kwargs=dict(every_n=every_n, key=key, col=col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def synth_media_dataset(n: int, kind: str = "image", seed: int = 42):
    """Deterministic media table for tests/demos."""
    import ray.data as rd
    blobs = []
    for i in range(n):
        if kind == "image":
            blobs.append(synth_image_blob(seed + i))
        elif kind == "video":
            blobs.append(synth_video_blob(seed + i))
        else:
            blobs.append(synth_audio_blob(seed + i))
    tbl = pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "kind": pa.array([kind] * n, type=pa.string()),
        "payload": pa.array(blobs, type=pa.binary()),
    })
    return rd.from_arrow(tbl)


class ResizeImages:
    """Actor-pool resize stage (the brief's resize verb): nearest-
    neighbor downscale of the SWIM fake container's pixel grid — the
    resampling math is REAL numpy (a production build swaps only the
    container codec), output is a new SWIM blob plus dimensions, with
    the same per-row error discipline as DecodeImages."""

    def __init__(self, out_w: int = 8, out_h: int = 6,
                 key: str = "media_id", col: str = "payload"):
        self.out_w = out_w
        self.out_h = out_h
        self.key = key
        self.col = col
        # real build: self.codec = load_image_codec()  (once per actor)

    def _resize(self, blob: bytes) -> bytes:
        if blob[:4] != b"SWIM":
            raise NotImplementedError(
                "real image codecs unavailable in this container; only "
                "the SWIM fake container resizes (task brief)")
        w, h, c = struct.unpack(">HHB", blob[4:9])
        px = np.frombuffer(blob[9:9 + w * h * c],
                           dtype=np.uint8).reshape(h, w, c)
        ys = (np.arange(self.out_h) * h // self.out_h)
        xs = (np.arange(self.out_w) * w // self.out_w)
        small = px[ys][:, xs]
        return (b"SWIM"
                + struct.pack(">HHB", self.out_w, self.out_h, c)
                + small.tobytes())

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pylist()
        blobs = batch.column(self.col).to_pylist()
        out_b, out_w, out_h, out_e = [], [], [], []
        for blob in blobs:
            try:
                nb = self._resize(blob or b"")
                out_b.append(nb)
                out_w.append(self.out_w)
                out_h.append(self.out_h)
                out_e.append(None)
            except Exception as e:
                out_b.append(b"")
                out_w.append(0)
                out_h.append(0)
                out_e.append(f"{type(e).__name__}: {e}")
        return pa.table({
            self.key: pa.array(keys),
            "payload": pa.array(out_b, type=pa.binary()),
            "width": pa.array(out_w, type=pa.int32()),
            "height": pa.array(out_h, type=pa.int32()),
            "error": pa.array(out_e, type=pa.string()),
        })


def resize_images(ds: Any, out_w: int = 8, out_h: int = 6,
                  key: str = "media_id", col: str = "payload",
                  concurrency=None, batch_size: int = 32) -> Any:
    from ..util import map_batches_stateful
    return map_batches_stateful(
        ds, ResizeImages,
        fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h,
                                   key=key, col=col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
