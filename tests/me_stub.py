"""Test-local MinkowskiEngine stand-in (pure torch, small scenes).

The reference implementation (``/root/reference``) runs its sparse conv
path on MinkowskiEngine; ME itself is not installable here, so parity
tests run the reference's OWN torch modules on this faithful stand-in.
Covered surface (everything ``pasco/models/{encoder_v2,decoder_v3,
unet3d_sparse_v2}.py``, ``pasco/maskpls/mink.py``,
``pasco/models/dropout.py`` and the transformer/criterion path touch):

* ``SparseTensor`` — ``.F/.C/.shape/features_at/coordinates_at/dense``,
  ``coordinate_map_key`` reconstruction, union ``+`` (ME adds features on
  the union coordinate map when the keys differ).
* ``MinkowskiConvolution`` — kernel taps enumerated the ME way
  (hypercube offsets, FIRST axis fastest; centered for odd kernels,
  ``0..K-1`` for even), kernel tensor ``[K^3, in, out]`` (``[in, out]``
  for 1x1), bias stored ``[1, out]``; stride-1 output coords == input
  coords (submanifold on the shared lattice), stride-s output coords =
  ``unique(floor(C / (ts*s)) * (ts*s))`` (ME coordinate-map stride).
* ``MinkowskiConvolutionTranspose(expand_coordinates=True)`` — the
  generative deconv: every input cell emits a child at
  ``c + off * out_ts`` per kernel tap (``decoder_v3.py`` uses ks=2/s=2).
* ``MinkowskiBatchNorm`` (``.bn`` wrapping ``BatchNorm1d``, ME layout),
  ``MinkowskiSyncBatchNorm.convert_sync_batchnorm`` (identity here),
  ReLU/LeakyReLU/Sigmoid/Softmax, ``MinkowskiLinear`` (``.linear``),
  ``MinkowskiPruning``, ``MinkowskiGlobalPooling`` (per-batch mean),
  ``MinkowskiBroadcastMultiplication``, ``MinkowskiMaxPooling``
  (kernel == stride), ``to_sparse``, ``utils.batched_coordinates``.

Install with :func:`install` BEFORE importing any reference module.
"""

from __future__ import annotations

import itertools
import sys
import types

import torch
import torch.nn as nn

# Coordinate hashing: scenes in tests are tiny; SHIFT/SPAN bound the
# coordinate range a key can represent (|coord| < SHIFT, batch < 2**14).
_SHIFT = 1 << 15
_SPAN = 1 << 16


def me_offsets(kernel_size: int, step: int):
    """ME ``KernelRegion`` offset enumeration, scaled by ``step``.

    ME enumerates hypercube offsets with the FIRST axis fastest (the
    ordering ``convert_torch.me_kernel_permutation`` converts from);
    odd kernels are centered, even kernels anchor at the output cell.
    """
    if kernel_size % 2 == 1:
        r = [i * step for i in range(-(kernel_size // 2), kernel_size // 2 + 1)]
    else:
        r = [i * step for i in range(kernel_size)]
    return [(x, y, z) for (z, y, x) in itertools.product(r, r, r)]


def _keys(c: torch.Tensor) -> torch.Tensor:
    """[N, 4] int coords (batch, x, y, z) -> unique int64 key per cell."""
    c = c.long()
    k = c[:, 0]
    for d in range(1, 4):
        k = k * _SPAN + (c[:, d] + _SHIFT)
    return k


class _CoordLookup:
    """Sorted-key lookup table: coord row -> feature row index."""

    def __init__(self, coords: torch.Tensor):
        keys = _keys(coords)
        self.sorted, self.perm = torch.sort(keys)

    def find(self, coords: torch.Tensor):
        q = _keys(coords)
        pos = torch.searchsorted(self.sorted, q)
        pos = pos.clamp(max=self.sorted.shape[0] - 1)
        found = self.sorted[pos] == q
        return self.perm[pos], found


def build() -> types.ModuleType:
    stub = types.ModuleType("MinkowskiEngine")

    class SparseTensor:
        def __init__(self, features=None, coordinates=None, tensor_stride=1,
                     coordinate_map_key=None, coordinate_manager=None, **kw):
            self.F = features
            if coordinates is None and coordinate_map_key is not None:
                coordinates, tensor_stride = coordinate_map_key
            self.C = coordinates
            if isinstance(tensor_stride, int):
                tensor_stride = [tensor_stride] * 3
            self.tensor_stride = list(tensor_stride)
            self.coordinate_manager = coordinate_manager

        @property
        def coordinate_map_key(self):
            return (self.C, tuple(self.tensor_stride))

        @property
        def shape(self):
            return self.F.shape

        @property
        def dtype(self):
            return self.F.dtype

        @property
        def device(self):
            return self.F.device

        def features_at(self, i):
            return self.F[self.C[:, 0] == i]

        def coordinates_at(self, i):
            return self.C[self.C[:, 0] == i][:, 1:]

        def __add__(self, other):
            # ME: same coordinate key -> elementwise; different keys under
            # one manager -> features added on the UNION coordinate map.
            if self.C.shape == other.C.shape and torch.equal(self.C, other.C):
                return SparseTensor(self.F + other.F, self.C,
                                    tensor_stride=self.tensor_stride)
            C = torch.cat([self.C.long(), other.C.long()], 0)
            F = torch.cat([self.F, other.F], 0)
            uniq, inv = torch.unique(C, dim=0, return_inverse=True)
            out = torch.zeros(uniq.shape[0], F.shape[1], dtype=F.dtype)
            out.index_add_(0, inv, F)
            return SparseTensor(out, uniq.int(),
                                tensor_stride=self.tensor_stride)

        def dense(self, shape=None, min_coordinate=None):
            stride = self.tensor_stride[0]
            c = self.C.long()
            if min_coordinate is None:
                mc = torch.zeros(3, dtype=torch.long)
            else:
                mc = torch.as_tensor(min_coordinate).long()
            rel = torch.div(c[:, 1:] - mc[None, :], stride,
                            rounding_mode="floor")
            if shape is None:
                bs = int(c[:, 0].max()) + 1
                ext = (rel.max(0)[0] + 1).tolist()
                shape = (bs, self.F.shape[1], *ext)
            out = torch.zeros(tuple(shape), dtype=self.F.dtype)
            out[c[:, 0], :, rel[:, 0], rel[:, 1], rel[:, 2]] = self.F
            return out, None, None

    class TensorField:
        pass

    class MinkowskiConvolution(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size=3,
                     stride=1, dilation=1, bias=False, dimension=3, **kw):
            super().__init__()
            assert dilation == 1 and dimension == 3
            self.in_channels = in_channels
            self.out_channels = out_channels
            self.kernel_size = kernel_size
            self.stride = stride
            kv = kernel_size ** 3
            std = (2.0 / (in_channels * kv)) ** 0.5
            if kernel_size == 1:
                self.kernel = nn.Parameter(
                    torch.randn(in_channels, out_channels) * std)
            else:
                self.kernel = nn.Parameter(
                    torch.randn(kv, in_channels, out_channels) * std)
            if bias:
                self.bias = nn.Parameter(torch.zeros(1, out_channels))
            else:
                self.bias = None

        def forward(self, st):
            ts = st.tensor_stride[0]
            if self.kernel_size == 1 and self.stride == 1:
                out = st.F @ self.kernel
                if self.bias is not None:
                    out = out + self.bias
                return SparseTensor(out, st.C, tensor_stride=ts)
            offs = me_offsets(self.kernel_size, ts)
            if self.stride == 1:
                outC = st.C.long()
                out_ts = ts
            else:
                s = ts * self.stride
                oc = st.C.long().clone()
                oc[:, 1:] = torch.div(oc[:, 1:], s, rounding_mode="floor") * s
                outC = torch.unique(oc, dim=0)
                out_ts = s
            table = _CoordLookup(st.C)
            acc = torch.zeros(outC.shape[0], self.out_channels,
                              dtype=st.F.dtype)
            q = outC.clone()
            for j, (ox, oy, oz) in enumerate(offs):
                q[:, 1] = outC[:, 1] + ox
                q[:, 2] = outC[:, 2] + oy
                q[:, 3] = outC[:, 3] + oz
                rows, found = table.find(q)
                f = st.F[rows] * found[:, None].to(st.F.dtype)
                acc = acc + f @ self.kernel[j]
            if self.bias is not None:
                acc = acc + self.bias
            return SparseTensor(acc, outC.int(), tensor_stride=out_ts)

    class MinkowskiConvolutionTranspose(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size=2,
                     stride=2, bias=False, dimension=3,
                     expand_coordinates=False, **kw):
            super().__init__()
            assert dimension == 3
            assert expand_coordinates, "stub covers the generative deconv"
            assert kernel_size == stride, "reference uses ks == stride == 2"
            self.out_channels = out_channels
            self.kernel_size = kernel_size
            self.stride = stride
            kv = kernel_size ** 3
            std = (2.0 / (in_channels * kv)) ** 0.5
            self.kernel = nn.Parameter(
                torch.randn(kv, in_channels, out_channels) * std)
            if bias:
                self.bias = nn.Parameter(torch.zeros(1, out_channels))
            else:
                self.bias = None

        def forward(self, st):
            ts = st.tensor_stride[0]
            out_ts = ts // self.stride
            offs = me_offsets(self.kernel_size, out_ts)
            cs, fs = [], []
            base = st.C.long()
            for j, (ox, oy, oz) in enumerate(offs):
                c = base.clone()
                c[:, 1] += ox
                c[:, 2] += oy
                c[:, 3] += oz
                cs.append(c)
                fs.append(st.F @ self.kernel[j])
            C = torch.cat(cs, 0)
            F = torch.cat(fs, 0)
            uniq, inv = torch.unique(C, dim=0, return_inverse=True)
            out = torch.zeros(uniq.shape[0], self.out_channels, dtype=F.dtype)
            out.index_add_(0, inv, F)
            if self.bias is not None:
                out = out + self.bias
            return SparseTensor(out, uniq.int(), tensor_stride=out_ts)

    class MinkowskiBatchNorm(nn.Module):
        def __init__(self, num_features, eps=1e-5, momentum=0.1):
            super().__init__()
            self.bn = nn.BatchNorm1d(num_features, eps=eps, momentum=momentum)

        def forward(self, st):
            return SparseTensor(self.bn(st.F), st.C,
                                tensor_stride=st.tensor_stride)

    class MinkowskiSyncBatchNorm(MinkowskiBatchNorm):
        @classmethod
        def convert_sync_batchnorm(cls, module):
            return module

    def _elementwise(fn_factory):
        class _E(nn.Module):
            def __init__(self, *a, **kw):
                super().__init__()
                self._fn = fn_factory(*a, **kw)

            def forward(self, st):
                return SparseTensor(self._fn(st.F), st.C,
                                    tensor_stride=st.tensor_stride)

        return _E

    MinkowskiReLU = _elementwise(
        lambda inplace=False: torch.relu)
    MinkowskiLeakyReLU = _elementwise(
        lambda negative_slope=0.01, inplace=False:
        (lambda x: torch.nn.functional.leaky_relu(x, negative_slope)))
    MinkowskiSigmoid = _elementwise(lambda: torch.sigmoid)
    MinkowskiSoftmax = _elementwise(
        lambda dim=1: (lambda x: torch.softmax(x, dim)))

    class MinkowskiLinear(nn.Module):
        def __init__(self, in_features, out_features, bias=True):
            super().__init__()
            self.linear = nn.Linear(in_features, out_features, bias=bias)

        def forward(self, st):
            return SparseTensor(self.linear(st.F), st.C,
                                tensor_stride=st.tensor_stride)

    class MinkowskiPruning(nn.Module):
        def forward(self, st, keep):
            return SparseTensor(st.F[keep], st.C[keep],
                                tensor_stride=st.tensor_stride)

    class MinkowskiGlobalPooling(nn.Module):
        def forward(self, st):
            b = st.C[:, 0].long()
            bs = int(b.max()) + 1
            out = torch.zeros(bs, st.F.shape[1], dtype=st.F.dtype)
            out.index_add_(0, b, st.F)
            cnt = torch.zeros(bs, dtype=st.F.dtype).index_add_(
                0, b, torch.ones_like(b, dtype=st.F.dtype))
            out = out / cnt[:, None].clamp(min=1)
            C = torch.zeros(bs, 4, dtype=torch.int32)
            C[:, 0] = torch.arange(bs)
            return SparseTensor(out, C, tensor_stride=st.tensor_stride)

    class MinkowskiBroadcastMultiplication(nn.Module):
        def forward(self, st, pooled):
            return SparseTensor(st.F * pooled.F[st.C[:, 0].long()], st.C,
                                tensor_stride=st.tensor_stride)

    class MinkowskiMaxPooling(nn.Module):
        def __init__(self, kernel_size=1, stride=1, dimension=3):
            super().__init__()
            assert kernel_size == stride, "stub supports kernel == stride"
            self.stride = stride

        def forward(self, st):
            s = self.stride
            c = st.C.clone().long()
            c[:, 1:] = torch.div(c[:, 1:], s, rounding_mode="floor") * s
            uniq, inv = torch.unique(c, dim=0, return_inverse=True)
            f = torch.full(
                (uniq.shape[0], st.F.shape[1]), float("-inf"),
                dtype=st.F.dtype,
            )
            f = f.scatter_reduce(
                0, inv[:, None].expand(-1, st.F.shape[1]), st.F,
                reduce="amax", include_self=True,
            )
            return SparseTensor(f, uniq.int(), tensor_stride=[s] * 3)

    def to_sparse(x):
        """[B, C, X, Y, Z] dense -> SparseTensor of nonzero cells."""
        mask = (x != 0).any(1)
        idx = mask.nonzero()
        F = x[idx[:, 0], :, idx[:, 1], idx[:, 2], idx[:, 3]]
        return SparseTensor(F, idx.int(), tensor_stride=1)

    def batched_coordinates(coord_list, **kw):
        rows = []
        for b, c in enumerate(coord_list):
            c = torch.as_tensor(c).long()
            bcol = torch.full((c.shape[0], 1), b, dtype=torch.long)
            rows.append(torch.cat([bcol, c], dim=1))
        return torch.cat(rows, dim=0).int()

    utils = types.ModuleType("MinkowskiEngine.utils")
    utils.batched_coordinates = batched_coordinates

    stub.SparseTensor = SparseTensor
    stub.TensorField = TensorField
    stub.MinkowskiConvolution = MinkowskiConvolution
    stub.MinkowskiConvolutionTranspose = MinkowskiConvolutionTranspose
    stub.MinkowskiBatchNorm = MinkowskiBatchNorm
    stub.MinkowskiSyncBatchNorm = MinkowskiSyncBatchNorm
    stub.MinkowskiReLU = MinkowskiReLU
    stub.MinkowskiLeakyReLU = MinkowskiLeakyReLU
    stub.MinkowskiSigmoid = MinkowskiSigmoid
    stub.MinkowskiSoftmax = MinkowskiSoftmax
    stub.MinkowskiLinear = MinkowskiLinear
    stub.MinkowskiPruning = MinkowskiPruning
    stub.MinkowskiGlobalPooling = MinkowskiGlobalPooling
    stub.MinkowskiBroadcastMultiplication = MinkowskiBroadcastMultiplication
    stub.MinkowskiMaxPooling = MinkowskiMaxPooling
    stub.MinkowskiModuleBase = nn.Module
    stub.to_sparse = to_sparse
    stub.utils = utils

    def _getattr(name):
        # Anything the reference imports at class-definition time but the
        # tests never execute resolves to a plain module base.  Dunder
        # lookups (``__file__``, ``__path__``...) must miss normally —
        # ``inspect``/import machinery probes them.
        if name.startswith("__"):
            raise AttributeError(name)
        return nn.Module

    stub.__getattr__ = _getattr
    return stub


def install() -> types.ModuleType:
    """Register the stub as ``MinkowskiEngine`` (idempotent)."""
    if "MinkowskiEngine" in sys.modules:
        return sys.modules["MinkowskiEngine"]
    stub = build()
    sys.modules["MinkowskiEngine"] = stub
    sys.modules["MinkowskiEngine.utils"] = stub.utils
    return stub


def install_reference_deps() -> None:
    """Shim third-party packages the reference imports but this image
    lacks: ``torch_scatter`` (only ``scatter_max`` over dim 0 is used,
    ``unet3d_sparse_v2.py:80``) and ``torchmetrics`` (class-definition
    surface of ``pasco/models/metrics.py`` only — never executed here)."""
    if "torch_scatter" not in sys.modules:
        try:
            import torch_scatter  # noqa: F401
        except ImportError:
            ts = types.ModuleType("torch_scatter")

            def scatter_max(src, index, dim=0):
                assert dim == 0
                n = int(index.max()) + 1
                out = torch.full(
                    (n, src.shape[1]), float("-inf"), dtype=src.dtype
                )
                out = out.scatter_reduce(
                    0, index[:, None].expand(-1, src.shape[1]), src,
                    reduce="amax", include_self=True,
                )
                return out, None

            ts.scatter_max = scatter_max
            sys.modules["torch_scatter"] = ts
    if "pykeops" not in sys.modules:
        try:
            import pykeops  # noqa: F401
        except ImportError:
            # pasco/maskpls/interpolate.py imports Vi/Vj at module scope;
            # knn_up itself is never exercised by these parity tests.
            pk = types.ModuleType("pykeops")
            pk.set_verbose = lambda *a, **kw: None
            pkt = types.ModuleType("pykeops.torch")
            pkt.Vi = lambda *a, **kw: None
            pkt.Vj = lambda *a, **kw: None
            pk.torch = pkt
            sys.modules["pykeops"] = pk
            sys.modules["pykeops.torch"] = pkt
    if "torchmetrics" not in sys.modules:
        try:
            import torchmetrics  # noqa: F401
        except ImportError:
            tm = types.ModuleType("torchmetrics")
            tm.Metric = type("Metric", (nn.Module,), {})
            func = types.ModuleType("torchmetrics.functional")
            cls = types.ModuleType("torchmetrics.functional.classification")
            cls.binary_calibration_error = lambda *a, **kw: None
            func.classification = cls
            data = types.ModuleType("torchmetrics.utilities.data")
            data.dim_zero_cat = lambda x: torch.cat(list(x), dim=0)
            util = types.ModuleType("torchmetrics.utilities")
            util.data = data
            tm.functional = func
            tm.utilities = util
            sys.modules["torchmetrics"] = tm
            sys.modules["torchmetrics.functional"] = func
            sys.modules["torchmetrics.functional.classification"] = cls
            sys.modules["torchmetrics.utilities"] = util
            sys.modules["torchmetrics.utilities.data"] = data
