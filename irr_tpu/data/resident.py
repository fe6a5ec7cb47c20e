"""HBM-resident dataset mode (--dataset_resident).

Small flow datasets (FlyingChairs* at 384x512: ~3 MB/sample) fit in one
chip's HBM. Uploading the decoded samples ONCE and gathering batches
on-device turns the per-step host->device traffic into B int32 indices,
so training runs at device speed even when the host link is slow — the
TPU-native answer to torch's per-step pinned-memory H2D copy (reference
configuration.py:412-446 + runtime.py:172-180 move every batch every
step).

Per-step pipeline (all on device, one jitted call chain):
  indices -> jnp.take gather from the resident arrays
          -> photometric jitter (irr_tpu/augment/photometric.py), if the
             dataset was built with photometric_augmentations
          -> the normal jitted affine augmentation (train) or nothing
             (validation; the eval step normalizes uint8 in-graph).

Flows are stored f16 (|flow| <= ~50 px -> quantization <= 0.025 px,
far under EPE scales) and cast back to f32 at gather; images/occ stay
uint8. Upload goes through jit-argument transfer in equal-size chunks
into a donated dynamic_update_slice ring — the only H2D path that
streams at full link speed in this environment (PERF.md, tunnel notes).
"""

import logging

import numpy as np

import jax
import jax.numpy as jnp


_ARRAY_KEYS = ("input1", "input2", "target1", "target2",
               "target_occ1", "target_occ2", "input_valid")


def _storage_dtype(key, arr):
    if key.startswith("target") and arr.dtype == np.float32:
        return np.float16
    return arr.dtype


def _gather_batch(arrays, idx):
    """On-device batch gather from the resident arrays (f16 -> f32)."""
    out = {}
    for k, a in arrays.items():
        g = jnp.take(a, idx, axis=0)
        if g.dtype == jnp.float16:
            g = g.astype(jnp.float32)
        out[k] = g
    out["index"] = idx
    return out


def _sharded_gather(mesh, arrays, idx):
    """Gather from a SAMPLE-SHARDED resident set (multi-chip mode).

    Each device holds a contiguous sample shard. For a global index batch
    (replicated), every device takes its local hits (masked to zero
    elsewhere) and one `psum_scatter` over the data axis both sums the
    single nonzero contribution per row AND leaves each device exactly
    its batch shard — the whole cross-device exchange is ONE
    reduce-scatter riding ICI, and the output is already sharded the way
    the train step's in_shardings want it. Dataset capacity scales
    linearly with mesh size (a 16 GB/chip budget becomes N x 16 GB).
    """
    from jax.sharding import PartitionSpec as P

    n_dev = int(mesh.devices.size)
    if idx.shape[0] % n_dev:
        raise ValueError(
            f"sharded resident gather needs batch ({idx.shape[0]}) divisible "
            f"by the mesh size ({n_dev})")

    def local(arrs, li):
        n_local = next(iter(arrs.values())).shape[0]
        rel = li - jax.lax.axis_index("data") * n_local
        ok = (rel >= 0) & (rel < n_local)
        relc = jnp.clip(rel, 0, n_local - 1)
        out = {}
        for k, a in arrs.items():
            g = jnp.take(a, relc, axis=0)
            g = jnp.where(ok.reshape((-1,) + (1,) * (g.ndim - 1)),
                          g, jnp.zeros((), g.dtype))
            out[k] = jax.lax.psum_scatter(g, "data", scatter_dimension=0,
                                          tiled=True)
        return out

    out = jax.shard_map(local, mesh=mesh,
                        in_specs=(P("data"), P()), out_specs=P("data"))(
        arrays, idx)
    out = {k: v.astype(jnp.float32) if v.dtype == jnp.float16 else v
           for k, v in out.items()}
    # match the rest of the batch: the train step's in_shardings put every
    # leaf's leading axis on the data axis
    from jax.sharding import NamedSharding
    out["index"] = jax.lax.with_sharding_constraint(
        idx, NamedSharding(mesh, P("data")))
    return out


class ResidentData:
    """Decode a whole dataset, stack per-field, upload once to device.

    With `mesh` (>1 device): the sample axis is sharded over the mesh's
    data axis (padded by wrapping to a multiple of the mesh size; the pad
    rows are never indexed because index batches draw from [0, n)), and
    gathers go through _sharded_gather.
    """

    def __init__(self, dataset, chunk=64, name="dataset", mesh=None):
        n = len(dataset)
        first = dataset[0]
        keys = [k for k in _ARRAY_KEYS if k in first]
        host = {k: np.empty((n,) + first[k].shape,
                            _storage_dtype(k, np.asarray(first[k])))
                for k in keys}
        for i in range(n):
            ex = dataset[i]
            for k in keys:
                host[k][i] = ex[k]
        total_mb = sum(a.nbytes for a in host.values()) / 1e6
        self.n = n
        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) else None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_dev = int(self.mesh.devices.size)
            pad = (-n) % n_dev
            if pad:
                host = {k: np.concatenate([v, v[:pad]]) for k, v in host.items()}
            logging.info("resident %s: %d samples, %.0f MB -> HBM, "
                         "sample-sharded over %d devices (%.0f MB/device)",
                         name, n, total_mb, n_dev, total_mb / n_dev)
            sh = NamedSharding(self.mesh, P("data"))
            self.arrays = {k: jax.device_put(v, sh) for k, v in host.items()}
        else:
            logging.info("resident %s: %d samples, %.0f MB -> HBM",
                         name, n, total_mb)
            self.arrays = {k: _upload(v, chunk) for k, v in host.items()}
        self._gather = jax.jit(self.gather_in_graph)

    def gather_in_graph(self, arrays, idx):
        """The gather body, for embedding inside a larger jitted program."""
        if self.mesh is not None:
            return _sharded_gather(self.mesh, arrays, idx)
        return _gather_batch(arrays, idx)

    def gather(self, idx):
        return self._gather(self.arrays, jnp.asarray(idx, jnp.int32))


def _upload(host_arr, chunk):
    """Chunked H2D through the jit-argument path into a donated buffer.

    Equal-size chunks keep one executable; the tail chunk is padded on
    host and the pad rows overwritten never (buffer pre-sized to n)."""
    n = host_arr.shape[0]
    chunk = min(chunk, n)
    buf = jnp.zeros(host_arr.shape, host_arr.dtype)

    def place(b, c, start):
        zeros = (0,) * (b.ndim - 1)
        return jax.lax.dynamic_update_slice(b, c, (start,) + zeros)

    placer = jax.jit(place, donate_argnums=(0,))
    for s in range(0, n, chunk):
        if s + chunk > n:
            s = n - chunk  # slide the last window back: full-size chunk,
        c = host_arr[s:s + chunk]  # re-writing a few already-placed rows
        buf = placer(buf, c, jnp.int32(s))
    return buf


class ResidentIndexLoader:
    """DataLoader-shaped iterable that yields only index batches."""

    def __init__(self, n, batch_size, shuffle=False, seed=0, drop_last=False):
        self.n = int(n)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._seed = seed
        self._epoch = 0

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def __iter__(self):
        order = np.arange(self.n)
        if self.shuffle:
            np.random.RandomState(self._seed + self._epoch).shuffle(order)
        self._epoch += 1
        for i in range(0, self.n, self.batch_size):
            chunk = order[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                break
            yield {"index": chunk.astype(np.int32)}


class ResidentBatchFn:
    """Augmentation-slot wrapper: gather (+ photometric) (+ inner aug).

    Drops into the loop's `batch, key = aug(batch, key)` contract
    (runtime/loop.py): receives the index batch from ResidentIndexLoader,
    returns full device batches. With photometric=True the images come
    back float32 [0,1] (jitter+gamma applied); otherwise uint8, and the
    train/eval step normalizes in-graph as usual.
    """

    def __init__(self, resident, inner_aug=None, photometric=False):
        self._resident = resident
        self._inner = inner_aug
        self._photometric = bool(photometric)
        if self._photometric:
            from ..augment.photometric import photometric_pair_batch
            self._photo_body = photometric_pair_batch
            # jit ONCE: wrapping per call would retrace every batch
            self._photo_jit = jax.jit(photometric_pair_batch)
        # fuse gather (+ photometric) (+ affine body) into ONE jitted
        # program: each separate dispatch costs a host->device round-trip
        # on high-latency links, and fusing drops the intermediate
        # full-batch buffers
        inner_body = getattr(inner_aug, "_body", None)
        if inner_aug is None or inner_body is not None:
            from ..nn.core import normalize_image_batch

            def fused(arrays, idx, key):
                g = resident.gather_in_graph(arrays, idx)
                if self._photometric:
                    key, k_p = jax.random.split(key)
                    im1, im2 = self._photo_body(g["input1"], g["input2"], k_p)
                    g = dict(g, input1=im1, input2=im2)
                if inner_body is not None:
                    key, k_a = jax.random.split(key)
                    g = inner_body(normalize_image_batch(g), k_a,
                                   addnoise=inner_aug._addnoise,
                                   crop=inner_aug._crop)
                return g

            self._fused = jax.jit(fused)
        else:
            self._fused = None

    def __call__(self, batch, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        if self._fused is not None:
            key, sub = jax.random.split(key)
            g = self._fused(self._resident.arrays,
                            jnp.asarray(batch["index"], jnp.int32), sub)
            return g, key
        g = self._resident.gather(batch["index"])
        if self._photometric:
            key, sub = jax.random.split(key)
            im1, im2 = self._photo_jit(g["input1"], g["input2"], sub)
            g = dict(g, input1=im1, input2=im2)
        if self._inner is not None:
            return self._inner(g, key)
        return g, key
