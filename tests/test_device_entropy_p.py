"""On-device P-slice CAVLC assembly must match the host packer byte-for-byte."""

import numpy as np
import pytest

from tpuh264.core.params import PPS, SPS
from tpuh264.entropy import device_pack, packp
from tpuh264.kernels import iframe, pframe
from tests.test_golden_pframe import moving_sequence


def _host_pack_p(symbols, sps, pps, qp, frame_num):
    n = sps.mb_width * sps.mb_height
    s = symbols
    mb_info = np.zeros((n, 8), np.int32)
    mb_info[:, 0] = np.asarray(s.kind[0]).reshape(n)
    mb_info[:, 1] = np.asarray(s.mode[0]).reshape(n)
    mb_info[:, 2] = np.asarray(s.cmode[0]).reshape(n)
    mb_info[:, 3] = np.asarray(s.cbp_luma[0]).reshape(n)
    mb_info[:, 4] = np.asarray(s.cbp_chroma[0]).reshape(n)
    mb_info[:, 5] = np.asarray(s.mvdx[0]).reshape(n)
    mb_info[:, 6] = np.asarray(s.mvdy[0]).reshape(n)
    return packp.pack_pframe(
        mb_info,
        np.asarray(s.luma_dc[0]).reshape(n, 16),
        np.asarray(s.luma_ac[0]).reshape(n, 16, 16),
        np.asarray(s.chroma_dc[0]).reshape(n, 2, 4),
        np.asarray(s.chroma_ac[0]).reshape(n, 2, 4, 15),
        sps, pps, qp, slice_mode="rows", frame_num=frame_num,
    )


def _p_symbols(frames, qp):
    """Run the TPU IPPP kernels; yields (t, symbols) for each P frame."""
    ref = None
    for t, (y, u, v) in enumerate(frames):
        yb = np.asarray(y, np.int32)[None]
        ub = np.asarray(u, np.int32)[None]
        vb = np.asarray(v, np.int32)[None]
        if t == 0:
            _, recon = iframe.encode_iframe_rows(yb, ub, vb, qp)
        else:
            symbols, recon, _ = pframe.encode_pframe_rows(
                yb, ub, vb, ref[0], ref[1], ref[2], qp
            )
            yield t, symbols
        ref = tuple(np.asarray(r).astype(np.int32) for r in recon)


@pytest.mark.parametrize("qp", [24, 34])
def test_device_pframe_bits_match_host(qp):
    h, w = 48, 64
    sps, pps = SPS.for_size(w, h), PPS()
    frames = moving_sequence(h, w, 3, seed=5)
    for t, symbols in _p_symbols(frames, qp):
        host = _host_pack_p(symbols, sps, pps, qp, t)
        dev, ovf = device_pack.assemble_pframe(
            symbols, sps, pps, qp, frame_num=t
        )
        assert not ovf
        assert dev[0] == host


def test_device_pframe_all_skip_rows():
    """A static scene skips whole rows: trailing skip_run paths."""
    h, w = 48, 64
    qp = 30
    sps, pps = SPS.for_size(w, h), PPS()
    y0, u0, v0 = moving_sequence(h, w, 1, seed=9)[0]
    frames = [(y0, u0, v0), (y0.copy(), u0.copy(), v0.copy())]
    for t, symbols in _p_symbols(frames, qp):
        kinds = np.asarray(symbols.kind[0])
        assert (kinds == 0).any()  # the scene must actually produce skips
        host = _host_pack_p(symbols, sps, pps, qp, t)
        dev, ovf = device_pack.assemble_pframe(
            symbols, sps, pps, qp, frame_num=t
        )
        assert not ovf
        assert dev[0] == host
