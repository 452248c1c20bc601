"""Input encodings as functional (init, apply) modules in pure jnp.

TPU-native replacements for the tiny-cuda-nn encodings used by the reference
(reference: model/encodings.py:6-103): multiresolution HashGrid (instant-ngp
style, trainable), OneBlob, Frequency, SphericalHarmonics (degree<=4), Dense
grid and Identity. Hash-table lookups are XLA gathers; gradients flow back to
the tables via the gather transpose (scatter-add), replacing tcnn's fused
CUDA backward.

Grid alignment follows tcnn's convention so encodings behave the same under
interpolation: level scale s_l = base * growth**l - 1, voxel position
p * s_l + 0.5, corner = floor(.), trilinear weights from the fraction.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Spatial-hash primes (instant-ngp / tcnn convention: x unhashed).
_PRIMES = (1, 2654435761, 805459861)


class HashGridEncoding:
    """Multiresolution hash-grid encoding (trainable).

    Matches the reference's tcnn HashGrid configuration
    (model/encodings.py:33-51): n_levels levels, `level_dim` features per
    level, per-level growth derived from desired_resolution as
    exp2(log2(desired / n_levels) / (n_levels - 1)).
    """

    def __init__(
        self,
        n_levels: int = 16,
        level_dim: int = 2,
        base_resolution: int = 16,
        log2_hashmap_size: int = 19,
        desired_resolution: int = 512,
        hash_impl: str = "auto",
    ):
        # lookup implementation: 'xla' = per-row gathers (scatter-add
        # backward); 'pallas' = the dynamic-gather forward + one-hot MXU
        # segment-sum backward kernels (ops.pallas.hash_enc — the path
        # that makes strict reference parity usable on TPU); 'auto' =
        # pallas on TPU, xla elsewhere (the kernels run in interpret mode
        # off-TPU: correct but slow — tests opt in explicitly).
        if hash_impl not in ("auto", "xla", "pallas"):
            raise ValueError(f"hash_impl must be auto/xla/pallas, "
                             f"got {hash_impl!r}")
        self.hash_impl = hash_impl
        self.n_levels = n_levels
        self.level_dim = level_dim
        self.base_resolution = base_resolution
        self.hashmap_size = 1 << log2_hashmap_size
        if n_levels > 1:
            self.per_level_scale = 2.0 ** (
                math.log2(desired_resolution / n_levels) / (n_levels - 1)
            )
        else:
            self.per_level_scale = 1.0
        self.out_dim = n_levels * level_dim

        # Per-level resolutions and table offsets (tcnn grid.h convention).
        self.resolutions = []
        self.offsets = [0]
        self.hashed = []
        off = 0
        for lvl in range(n_levels):
            scale = self.base_resolution * (self.per_level_scale ** lvl) - 1.0
            res = int(math.ceil(scale)) + 1
            dense = res ** 3
            use_hash = dense > self.hashmap_size
            size = self.hashmap_size if use_hash else dense
            # Align to 8 entries like tcnn for reproducible layouts.
            size = (size + 7) // 8 * 8
            self.resolutions.append(res)
            self.hashed.append(use_hash)
            off += size
            self.offsets.append(off)
        self.table_size = off
        self._res_arr = jnp.asarray(self.resolutions, jnp.int32)
        self._off_arr = jnp.asarray(self.offsets[:-1], jnp.uint32)
        self._level_size = jnp.asarray(
            [self.offsets[i + 1] - self.offsets[i] for i in range(n_levels)],
            jnp.uint32,
        )
        self._hashed_arr = jnp.asarray(self.hashed, bool)

    def init(self, key) -> jnp.ndarray:
        # tcnn initializes hash tables ~ U(-1e-4, 1e-4).
        return jax.random.uniform(
            key, (self.table_size, self.level_dim), jnp.float32, -1e-4, 1e-4
        )

    def __call__(self, table: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, 3] in [0, 1] -> features [N, n_levels * level_dim]."""
        impl = self.hash_impl
        if impl == "auto":
            impl = "pallas" if (jax.default_backend() == "tpu"
                                and self.level_dim == 2) else "xla"
        if impl == "pallas":
            if self.level_dim != 2:
                # an explicit request must not silently benchmark XLA
                # (ADVICE r4); only 'auto' falls back quietly
                raise ValueError(
                    f"hash_impl='pallas' supports level_dim=2 only "
                    f"(got {self.level_dim}); use 'auto' or 'xla'")
            from remixfusion_tpu.ops.pallas.hash_enc import hash_encode
            return hash_encode(self, table, x)
        n = x.shape[0]
        L = self.n_levels
        # Per-level voxel coordinates: pos = x * scale + 0.5 (tcnn grid.h).
        scales = jnp.asarray(
            [self.base_resolution * (self.per_level_scale ** l) - 1.0 for l in range(L)],
            jnp.float32,
        )
        pos = x[:, None, :] * scales[None, :, None] + 0.5  # [N, L, 3]
        corner = jnp.floor(pos)
        frac = pos - corner
        corner = corner.astype(jnp.int32)  # [N, L, 3]

        res = self._res_arr  # [L]
        feats = []
        # Accumulate the 8-corner interpolation; indices computed per corner.
        out = jnp.zeros((n, L, self.level_dim), jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    cx = corner[..., 0] + dx
                    cy = corner[..., 1] + dy
                    cz = corner[..., 2] + dz
                    # Dense index (x-major like tcnn: stride 1, res, res^2).
                    dense_idx = (
                        cx.astype(jnp.uint32)
                        + cy.astype(jnp.uint32) * res.astype(jnp.uint32)[None, :]
                        + cz.astype(jnp.uint32)
                        * (res.astype(jnp.uint32) ** 2)[None, :]
                    )
                    hash_idx = (
                        cx.astype(jnp.uint32) * np.uint32(_PRIMES[0])
                        ^ cy.astype(jnp.uint32) * np.uint32(_PRIMES[1])
                        ^ cz.astype(jnp.uint32) * np.uint32(_PRIMES[2])
                    )
                    idx = jnp.where(self._hashed_arr[None, :], hash_idx, dense_idx)
                    idx = idx % self._level_size[None, :] + self._off_arr[None, :]
                    w = (
                        (frac[..., 0] if dx else 1 - frac[..., 0])
                        * (frac[..., 1] if dy else 1 - frac[..., 1])
                        * (frac[..., 2] if dz else 1 - frac[..., 2])
                    )
                    out = out + w[..., None] * table[idx.astype(jnp.int32)]
        return out.reshape(n, self.out_dim)


class DenseGridEncoding:
    """Multi-level dense grid encoding (trainable), tcnn 'Dense' analog."""

    def __init__(self, n_levels=4, level_dim=2, base_resolution=16,
                 desired_resolution=512):
        per_level_scale = 2.0 ** (
            math.log2(desired_resolution / n_levels) / max(n_levels - 1, 1)
        )
        self.inner = HashGridEncoding(
            n_levels=n_levels, level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=31,  # large enough that every level is dense
            desired_resolution=desired_resolution,
        )
        self.inner.per_level_scale = per_level_scale
        self.out_dim = self.inner.out_dim

    def init(self, key):
        return self.inner.init(key)

    def __call__(self, table, x):
        return self.inner(table, x)


class TriplaneEncoding:
    """Factorized triplane + triline encoding (TensoRF-VM style), trainable.

    A TPU-first alternative to the multiresolution hash grid: features are
    products of bilinear samples of three axis-aligned 2D planes and linear
    samples of the three complementary 1D lines, concatenated over levels.
    Per query point this costs 3 axes x L levels x 4 plane corners + 2 line
    ends of F-wide rows — ~3x fewer and wider random-row gathers than the
    hash grid's 16 levels x 8 corners of 2-wide rows, which is what TPU
    gather/scatter throughput is priced on. Quality class: TensoRF /
    factorized-field (sufficient for the *residual* field of the mixed
    representation, where the explicit grid carries the coarse geometry).
    """

    def __init__(self, n_levels: int = 3, level_dim: int = 4,
                 base_resolution: int = 64, desired_resolution: int = 512):
        self.n_levels = n_levels
        self.level_dim = level_dim
        if n_levels > 1:
            growth = (desired_resolution / base_resolution) ** (1.0 / (n_levels - 1))
        else:
            growth = 1.0
        self.resolutions = [
            min(int(round(base_resolution * growth ** l)), 2048)
            for l in range(n_levels)]
        self.out_dim = 3 * n_levels * level_dim

    def init(self, key):
        params = {}
        keys = jax.random.split(key, 6 * self.n_levels)
        ki = 0
        for l, res in enumerate(self.resolutions):
            for a in range(3):
                params[f"plane_{l}_{a}"] = jax.random.uniform(
                    keys[ki], (res * res, self.level_dim), jnp.float32,
                    -1e-2, 1e-2)
                ki += 1
                # lines start near 1 so plane*line ~ plane initially
                params[f"line_{l}_{a}"] = 1.0 + jax.random.uniform(
                    keys[ki], (res, self.level_dim), jnp.float32, -1e-2, 1e-2)
                ki += 1
        return params

    @staticmethod
    def _bilinear(plane, res, u, v):
        """plane: [res*res, F]; u, v in [0, 1] -> [N, F]."""
        pu = jnp.clip(u * (res - 1), 0.0, res - 1 - 1e-6)
        pv = jnp.clip(v * (res - 1), 0.0, res - 1 - 1e-6)
        iu = jnp.floor(pu).astype(jnp.int32)
        iv = jnp.floor(pv).astype(jnp.int32)
        fu = (pu - iu)[:, None]
        fv = (pv - iv)[:, None]
        base = iu * res + iv
        p00 = plane[base]
        p01 = plane[base + 1]
        p10 = plane[base + res]
        p11 = plane[base + res + 1]
        return ((1 - fu) * ((1 - fv) * p00 + fv * p01)
                + fu * ((1 - fv) * p10 + fv * p11))

    @staticmethod
    def _linear(line, res, w):
        pw = jnp.clip(w * (res - 1), 0.0, res - 1 - 1e-6)
        iw = jnp.floor(pw).astype(jnp.int32)
        fw = (pw - iw)[:, None]
        return (1 - fw) * line[iw] + fw * line[iw + 1]

    def __call__(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, 3] in [0, 1] -> [N, 3 * n_levels * level_dim]."""
        feats = []
        axes = ((0, 1, 2), (1, 2, 0), (2, 0, 1))  # (u, v, line axis)
        for l, res in enumerate(self.resolutions):
            for a, (ua, va, wa) in enumerate(axes):
                pl = self._bilinear(params[f"plane_{l}_{a}"], res,
                                    x[:, ua], x[:, va])
                ln = self._linear(params[f"line_{l}_{a}"], res, x[:, wa])
                feats.append(pl * ln)
        return jnp.concatenate(feats, axis=-1)


class CPGridEncoding:
    """CP-factorized multiresolution grid encoding evaluated on the MXU.

    The TPU-first residual field. Per level l, three trainable 1D factor
    tables A_l, B_l, C_l of shape [R_l, C_l]; the feature of a point is the
    channelwise product A_l(x) * B_l(y) * C_l(z) (CP / canonical-polyadic
    decomposition of a 3D feature volume, TensoRF-style), concatenated over
    levels. Each 1D interpolation is computed for the whole query batch as
    ONE dense matmul  tent(pos) @ table  where tent(pos)[n, i] =
    max(0, 1 - |pos_n - i|) is the two-nonzero linear-interpolation weight
    row — so both the forward AND the backward (grad wrt tables = tent^T @ g,
    grad wrt pos analytic through the tent) are MXU matmuls with zero
    gather/scatter rows. On TPU, where table gathers are per-row
    latency-priced and scatter-add backward dominates trainable-grid
    encoders (measured here: HashGrid ~3.4x, Triplane ~10x the map-step
    wall of this encoder), this turns the residual field from the
    bottleneck into noise.

    Replaces the reference's tcnn HashGrid residual encoding
    (model/encodings.py:39-50) at equivalent quality class — see the
    A/B table in BASELINE.md (ATE / mesh F1 / PSNR vs HashGrid and
    Triplane on the synthetic verify scene).
    """

    def __init__(self, n_levels: int = 4, level_dim: int = 0,
                 base_resolution: int = 48, desired_resolution: int = 640):
        self.n_levels = n_levels
        top = max(min(desired_resolution, 800), base_resolution + 1)
        if n_levels > 1:
            growth = (top / base_resolution) ** (1.0 / (n_levels - 1))
        else:
            growth = 1.0
        self.resolutions = [int(round(base_resolution * growth ** l))
                            for l in range(n_levels)]
        # wider channel banks at finer levels (capacity where detail lives)
        base_ch = [16, 32, 48, 48, 64, 64]
        self.channels = [base_ch[min(l, len(base_ch) - 1)]
                         for l in range(n_levels)]
        self.out_dim = sum(self.channels)

    def init(self, key):
        params = {}
        keys = jax.random.split(key, 3 * self.n_levels)
        ki = 0
        for l, (res, ch) in enumerate(zip(self.resolutions, self.channels)):
            for a in range(3):
                # x/y factors near 1, z factor small: products start ~1e-2
                # scale (like tcnn's small-table init) with healthy gradient
                # flow into the small factor (grad wrt C ~ A*B ~ 1).
                if a < 2:
                    params[f"fac_{l}_{a}"] = 1.0 + jax.random.uniform(
                        keys[ki], (res, ch), jnp.float32, -0.05, 0.05)
                else:
                    params[f"fac_{l}_{a}"] = jax.random.uniform(
                        keys[ki], (res, ch), jnp.float32, -1e-2, 1e-2)
                ki += 1
        return params

    def __call__(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, 3] in [0, 1] -> [N, sum(channels)]."""
        feats = []
        for l, (res, ch) in enumerate(zip(self.resolutions, self.channels)):
            pos = jnp.clip(x * (res - 1), 0.0, float(res - 1))  # [N, 3]
            idx = jnp.arange(res, dtype=jnp.float32)
            prod = None
            for a in range(3):
                # [N, res] tent rows; f32 construction (bf16 would quantize
                # the POSITION), bf16 operand (weights in [0,1] — 0.4% err)
                w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, a:a + 1]
                                                   - idx[None, :]))
                f = jax.lax.dot(
                    w.astype(jnp.bfloat16),
                    params[f"fac_{l}_{a}"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
                prod = f if prod is None else prod * f
            feats.append(prod)
        return jnp.concatenate(feats, axis=-1)


class OneBlobEncoding:
    """OneBlob encoding (n_bins per input dim).

    A Gaussian blob centered at the input is integrated over each of n_bins
    uniform bins of [0, 1] (sigma = 1 / n_bins), giving a smooth, localized
    positional code (the tcnn 'OneBlob' used by the reference for the
    positional branch, model/encodings.py:65-76).
    """

    def __init__(self, n_bins: int = 16, input_dim: int = 3):
        self.n_bins = n_bins
        self.input_dim = input_dim
        self.out_dim = n_bins * input_dim
        edges = jnp.linspace(0.0, 1.0, n_bins + 1)
        self._lo = edges[:-1]
        self._hi = edges[1:]
        self._sigma = 1.0 / n_bins

    def init(self, key):
        return None

    def __call__(self, _params, x: jnp.ndarray) -> jnp.ndarray:
        # x: [N, D] in [0, 1]
        inv = 1.0 / (self._sigma * math.sqrt(2.0))
        up = jax.scipy.special.erf((self._hi[None, None, :] - x[..., None]) * inv)
        lo = jax.scipy.special.erf((self._lo[None, None, :] - x[..., None]) * inv)
        # scale by n_bins so the peak bin is O(1)
        val = 0.5 * (up - lo) * self.n_bins * (self._sigma * math.sqrt(2 * math.pi))
        return val.reshape(x.shape[0], self.out_dim)


class FrequencyEncoding:
    """NeRF-style sin/cos frequency encoding."""

    def __init__(self, n_frequencies: int = 12, input_dim: int = 3):
        self.n_frequencies = n_frequencies
        self.input_dim = input_dim
        self.out_dim = input_dim * n_frequencies * 2
        self._freqs = 2.0 ** jnp.arange(n_frequencies)

    def init(self, key):
        return None

    def __call__(self, _params, x):
        xf = x[..., None] * self._freqs[None, None, :] * math.pi
        enc = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)
        return enc.reshape(x.shape[0], self.out_dim)


class SphericalHarmonicsEncoding:
    """Real spherical harmonics of a direction, degrees 1..4 (16 coeffs)."""

    def __init__(self, degree: int = 4):
        assert 1 <= degree <= 4
        self.degree = degree
        self.out_dim = degree ** 2

    def init(self, key):
        return None

    def __call__(self, _params, d):
        # d: [N, 3], assumed normalized to the unit sphere from [0,1]^3 inputs
        # (tcnn maps [0,1] -> [-1,1]).
        d = d * 2.0 - 1.0
        x, y, z = d[:, 0], d[:, 1], d[:, 2]
        out = [jnp.full_like(x, 0.28209479177387814)]
        if self.degree > 1:
            out += [-0.48860251190291987 * y,
                    0.48860251190291987 * z,
                    -0.48860251190291987 * x]
        if self.degree > 2:
            xy, yz, xz = x * y, y * z, x * z
            x2, y2, z2 = x * x, y * y, z * z
            out += [1.0925484305920792 * xy,
                    -1.0925484305920792 * yz,
                    0.94617469575755997 * z2 - 0.31539156525251999,
                    -1.0925484305920792 * xz,
                    0.54627421529603959 * (x2 - y2)]
        if self.degree > 3:
            out += [0.59004358992664352 * y * (-3.0 * x2 + y2),
                    2.8906114426405538 * xy * z,
                    0.45704579946446572 * y * (1.0 - 5.0 * z2),
                    0.3731763325901154 * z * (5.0 * z2 - 3.0),
                    0.45704579946446572 * x * (1.0 - 5.0 * z2),
                    1.4453057213202769 * z * (x2 - y2),
                    0.59004358992664352 * x * (-x2 + 3.0 * y2)]
        return jnp.stack(out, axis=-1)


class IdentityEncoding:
    def __init__(self, input_dim: int = 3):
        self.out_dim = input_dim

    def init(self, key):
        return None

    def __call__(self, _params, x):
        return x


def get_encoder(
    encoding: str,
    input_dim: int = 3,
    degree: int = 4,
    n_bins: int = 16,
    n_frequencies: int = 12,
    n_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int = 512,
    hash_impl: str = "auto",
):
    """Encoder factory with the reference's name-matching rules
    (model/encodings.py:6-103). Returns (encoder, out_dim)."""
    enc = encoding.lower()
    if "cpgrid" in enc or enc == "cp":
        e = CPGridEncoding(n_levels=4, base_resolution=48,
                           desired_resolution=min(desired_resolution, 800))
    elif "triplane" in enc:
        e = TriplaneEncoding(n_levels=3, level_dim=4,
                             base_resolution=64,
                             desired_resolution=min(desired_resolution, 1024))
    elif "dense" in enc:
        e = DenseGridEncoding(4, level_dim, base_resolution, desired_resolution)
    elif "hash" in enc or "tiled" in enc:
        e = HashGridEncoding(n_levels, level_dim, base_resolution,
                             log2_hashmap_size, desired_resolution,
                             hash_impl=hash_impl)
    elif "spherical" in enc:
        e = SphericalHarmonicsEncoding(degree)
    elif "blob" in enc:
        e = OneBlobEncoding(n_bins, input_dim)
    elif "freq" in enc:
        e = FrequencyEncoding(n_frequencies, input_dim)
    elif "identity" in enc:
        e = IdentityEncoding(input_dim)
    else:
        raise ValueError(f"unknown encoding {encoding}")
    return e, e.out_dim
