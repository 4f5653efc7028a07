"""Analytic FLOP counts for the conv transforms (roofline/MFU accounting).

VERDICT r1 item 3: bench.py must report achieved TFLOP/s and MFU against the
chip's peak, not just images/s. Counts are MAC-based (2 FLOPs per MAC) for
the convolutions only — elementwise activations/colorspace are bandwidth, not
FLOPs, and contribute <0.1%.

Conventions: SAME padding; a stride-s conv with output HxW costs
2*K*K*Cin*Cout*H*W; a stride-s transposed conv with input HxW costs
2*K*K*Cin*Cout*H*W*... evaluated at its OUTPUT size divided by s^2 — i.e.
each input pixel drives K*K*Cout MACs per input channel, matching XLA's
gradient-of-conv lowering.
"""
from __future__ import annotations


def _conv(k: int, cin: int, cout: int, h_out: int, w_out: int) -> int:
    return 2 * k * k * cin * cout * h_out * w_out


# (kind, kernel, cin, cout, stride) per preset; 'T' = transposed.
_BASE_ANALYSIS = [
    ("C", 5, 1, 32, 2),
    ("C", 5, 32, 64, 2),
    ("C", 3, 64, 64, 1),
    ("C", 3, 64, 64, 1),
    ("C", 5, 64, 32, 2),
]
_BASE_SYNTHESIS = [
    ("T", 5, 32, 64, 2),
    ("T", 3, 64, 64, 1),
    ("T", 3, 64, 64, 1),
    ("T", 5, 64, 64, 2),
    ("T", 5, 64, 1, 2),
]
_DEEP_ANALYSIS = [
    ("C", 5, 1, 32, 2),
    ("C", 5, 32, 64, 2),
    ("C", 3, 64, 64, 1),
    ("C", 3, 64, 64, 1),
    ("C", 5, 64, 64, 2),
    ("C", 3, 64, 64, 1),
    ("C", 3, 64, 64, 1),
    ("C", 5, 64, 32, 2),
]
_DEEP_SYNTHESIS = [
    ("T", 5, 32, 64, 2),
    ("C", 3, 64, 64, 1),
    ("C", 3, 64, 64, 1),
    ("T", 5, 64, 64, 2),
    ("C", 3, 64, 64, 1),
    ("C", 3, 64, 64, 1),
    ("T", 5, 64, 64, 2),
    ("T", 5, 64, 1, 2),
]


def _stack_flops(layers, h: int, w: int, transposed_dir: bool) -> int:
    """FLOPs of one plane through a layer stack. ``transposed_dir``: the
    stack upsamples (input is the latent grid). A transposed conv costs
    2*K*K*Cin*Cout per INPUT pixel (the full kernel scatters from each input
    element), which makes it symmetric with its forward counterpart."""
    total = 0
    for kind, k, cin, cout, s in layers:
        if kind == "T":
            total += _conv(k, cin, cout, h, w)
            h, w = h * s, w * s
        elif transposed_dir:
            total += _conv(k, cin, cout, h, w)  # stride-1 conv in the decoder
        else:
            h, w = -(-h // s), -(-w // s)
            total += _conv(k, cin, cout, h, w)
    return total


def _gdn_flops(layers, h: int, w: int, transposed_dir: bool) -> int:
    """Extra FLOPs of (I)GDN between stages: each non-final activation site
    computes the channel mix ``sum_j gamma_ij x_j^2`` — a CxC matmul over the
    stage's output grid, 2*C*C*H*W FLOPs (models/layers.py GDN). The final
    stage of each transform is linear (no GDN)."""
    total = 0
    sized = []
    for kind, _k, _cin, cout, s in layers:
        if kind == "T":
            h, w = h * s, w * s
        elif not transposed_dir:
            h, w = -(-h // s), -(-w // s)
        sized.append((cout, h, w))
    for cout, hh, ww in sized[:-1]:  # final stage stays linear
        total += 2 * cout * cout * hh * ww
    return total


def plane_flops(preset: str, h: int, w: int,
                activation: str = "preset_default") -> tuple[int, int]:
    """(analysis_flops, synthesis_flops) for ONE colour plane of an HxW
    image. ``h``, ``w`` are the (padded) image dims. ``activation='gdn'``
    adds the divisive-normalization channel-mix matmuls."""
    if preset == "base":
        ana, syn, ds = _BASE_ANALYSIS, _BASE_SYNTHESIS, 8
    elif preset == "deep":
        ana, syn, ds = _DEEP_ANALYSIS, _DEEP_SYNTHESIS, 16
    else:
        raise ValueError(preset)
    a = _stack_flops(ana, h, w, transposed_dir=False)
    s = _stack_flops(syn, h // ds, w // ds, transposed_dir=True)
    if activation == "gdn":
        a += _gdn_flops(ana, h, w, transposed_dir=False)
        s += _gdn_flops(syn, h // ds, w // ds, transposed_dir=True)
    return a, s


def round_trip_flops(preset: str, h: int, w: int,
                     activation: str = "preset_default") -> int:
    """Total conv FLOPs of a full 3-plane encode+decode of one HxW image
    (Y + Cb + Cr all run both transforms)."""
    a, s = plane_flops(preset, h, w, activation)
    return 3 * (a + s)


def _stack_hbm_bytes(layers, h: int, w: int, transposed_dir: bool,
                     itemsize: int) -> int:
    """Ideal-fusion HBM traffic of one plane through a layer stack: each
    layer reads its input activation once and writes its output once
    (activation/bias fused into the conv epilogue — XLA does this), plus one
    extra read per residual skip. Weights are <0.5 MB total and ignored."""
    total = 0
    for kind, _k, cin_l, cout, s in layers:
        in_px = h * w
        if kind == "T":
            h, w = h * s, w * s
        elif not transposed_dir:
            h, w = -(-h // s), -(-w // s)
        out_px = h * w
        total += (in_px * cin_l + out_px * cout) * itemsize
    # residual skips re-read a 64-ch mid-resolution tensor (one per stack in
    # 'base', two in 'deep') — <10% of total; left out of the ideal bound.
    return total


def _gdn_hbm_bytes(layers, h: int, w: int, transposed_dir: bool,
                   itemsize: int) -> int:
    """Extra HBM traffic of the (I)GDN sites when they do NOT fuse into the
    adjacent convs (one read + one write of each non-final stage output —
    the XLA einsum+rsqrt typically fuses partially, so this is the upper
    bound; the in-kernel Pallas epilogue would make it zero)."""
    total = 0
    sized = []
    for kind, _k, _cin, cout, s in layers:
        if kind == "T":
            h, w = h * s, w * s
        elif not transposed_dir:
            h, w = -(-h // s), -(-w // s)
        sized.append((cout, h, w))
    for cout, hh, ww in sized[:-1]:
        total += 2 * hh * ww * cout * itemsize
    return total


def round_trip_hbm_bytes(preset: str, h: int, w: int, itemsize: int = 2,
                         activation: str = "preset_default") -> int:
    """Ideal-fusion HBM bytes moved by a full 3-plane encode+decode of one
    HxW image (activations only; see _stack_hbm_bytes)."""
    if preset == "base":
        ana, syn, ds = _BASE_ANALYSIS, _BASE_SYNTHESIS, 8
    elif preset == "deep":
        ana, syn, ds = _DEEP_ANALYSIS, _DEEP_SYNTHESIS, 16
    else:
        raise ValueError(preset)
    a = _stack_hbm_bytes(ana, h, w, False, itemsize)
    s = _stack_hbm_bytes(syn, h // ds, w // ds, True, itemsize)
    if activation == "gdn":
        a += _gdn_hbm_bytes(ana, h, w, False, itemsize)
        s += _gdn_hbm_bytes(syn, h // ds, w // ds, True, itemsize)
    return 3 * (a + s)


def stage_table(preset: str, h: int, w: int, itemsize: int = 2,
                activation: str = "preset_default") -> list[dict]:
    """Per-stage accounting for ONE colour plane's round trip (VERDICT r4
    item 3: show where every HBM byte goes). Rows carry the conv FLOPs, the
    ideal-fusion activation traffic (read input once + write output once),
    and — for activation='gdn' — the EXTRA traffic when the norm runs as a
    separate XLA op between stages (one read + one write of the stage
    output; zero when the Pallas epilogue fuses it)."""
    if preset == "base":
        stacks = (("analysis", _BASE_ANALYSIS, False),
                  ("synthesis", _BASE_SYNTHESIS, True))
        ds = 8
    elif preset == "deep":
        stacks = (("analysis", _DEEP_ANALYSIS, False),
                  ("synthesis", _DEEP_SYNTHESIS, True))
        ds = 16
    else:
        raise ValueError(preset)
    rows = []
    for name, layers, tdir in stacks:
        hh, ww = (h, w) if not tdir else (h // ds, w // ds)
        n_layers = len(layers)
        for li, (kind, k, cin_l, cout, s) in enumerate(layers):
            in_px = hh * ww
            if kind == "T":
                hh, ww = hh * s, ww * s
            elif not tdir:
                hh, ww = -(-hh // s), -(-ww // s)
            out_px = hh * ww
            # transposed convs cost 2*K*K*Cin*Cout per INPUT pixel (see
            # _stack_flops); forward convs per OUTPUT pixel
            flops = 2 * k * k * cin_l * cout * (
                in_px if kind == "T" else out_px
            )
            hbm = (in_px * cin_l + out_px * cout) * itemsize
            gdn_site = activation == "gdn" and li < n_layers - 1
            rows.append({
                "stack": name,
                "layer": f"{kind}{k}x{k}s{s} {cin_l}->{cout}",
                "out_hw": (hh, ww),
                "gflops": flops / 1e9,
                "hbm_mb_ideal": hbm / 1e6,
                "gdn_gflops": (2 * cout * cout * out_px / 1e9) if gdn_site else 0.0,
                "gdn_hbm_mb_unfused": (
                    2 * out_px * cout * itemsize / 1e6 if gdn_site else 0.0
                ),
            })
    return rows


# Peak HBM bandwidth GB/s per chip by device_kind substring (public figures:
# v2 700, v3 900, v4 1228, v5e 819, v5p 2765, v6e/Trillium 1638).
PEAK_HBM_GBPS = {
    "v2": 700.0,
    "v3": 900.0,
    "v4": 1228.0,
    "v5 lite": 819.0,
    "v5litepod": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v5": 2765.0,
    "v6 lite": 1638.0,
    "v6e": 1638.0,
    "v6": 1638.0,
}


def _lookup_by_kind(table: dict, device_kind: str) -> float | None:
    """Substring match in insertion order (specific keys before generic)."""
    kind = device_kind.lower()
    for key in table:
        if key in kind:
            return table[key]
    return None


def chip_peak_hbm_gbps(device_kind: str) -> float | None:
    return _lookup_by_kind(PEAK_HBM_GBPS, device_kind)


# Dense bf16 peak FLOP/s per chip by device_kind substring. Public figures:
# v4 275 TF/s, v5e 197, v5p 459, v6e (Trillium) 918, v3 123, v2 46.
PEAK_BF16_TFLOPS = {
    "v2": 46.0,
    "v3": 123.0,
    "v4": 275.0,
    "v5 lite": 197.0,
    "v5litepod": 197.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v5": 459.0,  # plain "v5" after the lite variants in match order
    "v6 lite": 918.0,
    "v6e": 918.0,
    "v6": 918.0,
}


def chip_peak_tflops(device_kind: str) -> float | None:
    """Best-effort peak bf16 TFLOP/s for a jax device_kind string."""
    return _lookup_by_kind(PEAK_BF16_TFLOPS, device_kind)
