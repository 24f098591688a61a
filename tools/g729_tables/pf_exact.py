"""Exact fixed-point port of lavc's G.729 postfilter + AGC.

Transcribed instruction-by-instruction from g729postfilter.o disassembly
(/tmp/wbdis/g729pf.asm) and fuzz-validated against the linked probe of the
REAL object code (pf_probe.py).  This is the enhancement layer between the
(already bit-exact) excitation/synthesis replica and the output HPF, for the
reference's `g729a` channel tier
(/root/reference/channel_simulation/simulated_channel.py:36-39).

Structure (ff_g729_postfilter):
  1. lp_gn/lp_gd      = lp[1..10] * {0.55,0.7}^k (Q15 rounded products)
  2. residual[152+i]  = speech[i] + (sum lp_gn[k]*speech[i-k] + 0x800 >> 12)
                        (16-bit wrapping add; history = res_filter_data)
  3. bit-length normalization of the whole 192-entry residual to msb 11
  4. integer lag search best in {p-1,p,p+1} by plain max correlation
  5. 7 fractional candidates via the 2-tap (17-entry) interp filter,
     each with two windows (offset 0/1); cross-multiplied normalized
     corr^2/energy selection (int16-truncated normalized values)
  6. threshold: corr^2 << (2S+1) >= ener*en (else no filtering)
  7. integer winner -> weighted_vector_sum on the RAW residual;
     fractional winner -> re-interpolate with the 8x8 long filter,
     adversarially re-check vs the 2-tap winner, denormalize, same gain law
     w_cur = max(0x5555, (en<<15)/(en + corr/2)), w_del = 0x8000 - w_cur
  8. short-term 1/A(z/gd) synthesis into pos_filter_data[10..49]
  9. tilt: hf impulse response (33-entry buffer, h[-1]=4096),
     rh0/rh1 over h[-1..18], rc = (-rh1<<15)/rh0, branch gains
     0.2 (rc>0) / 0.9 (rc<=0), per-sample out = fact*(x + 2*gt_half*
     x_prev + 0x4000 >> 15) + round >> shift  (16-bit wrap store)
 10. gain scale by 0x2000000/(sum|h[-1..18]|>>2) when that sum > 0x1003
"""

from __future__ import annotations

import numpy as np

SUB = 40
RES_PREV = 152   # PITCH_DELAY_MAX(143) + interp margin(8) + 1

GN_POW = [18022, 9912, 5451, 2998, 1649, 907, 499, 274, 151, 83]
GD_POW = [22938, 16057, 11240, 7868, 5508, 3856, 2699, 1889, 1322, 925]

# g729postfilter.o .rodata: 8x8 long interp filter (idx 0..63) + 2x8
# short filter (idx 64..79)
PF_FILT = [0, 31915, 29436, 25569, 20676, 15206, 9639, 4439,
           0, -3390, -5579, -6549, -6414, -5392, -3773, -1874,
           0, 1595, 2727, 3303, 3319, 2850, 2030, 1023,
           0, -887, -1527, -1860, -1876, -1614, -1150, -579,
           0, 501, 859, 1041, 1044, 892, 631, 315,
           0, -266, -453, -543, -538, -455, -317, -156,
           0, 130, 218, 258, 253, 212, 147, 72,
           0, -59, -101, -122, -123, -106, -77, -40,
           0, 31650, 28469, 23705, 18050, 12266, 7041, 2873,
           0, -1597, -2147, -1992, -1492, -933, -484, -188]


def sat16(v):
    return -32768 if v < -32768 else (32767 if v > 32767 else int(v))


def wrap16(v):
    v = int(v) & 0xFFFF
    return v - 0x10000 if v >= 0x8000 else v


def wrap32(v):
    v = int(v) & 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


def cdiv(a, b):
    """C (x86 idiv) division: truncation toward zero."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def bsr(v):
    """x86 bsr of a 32-bit value (negative ints see bit 31)."""
    return ((int(v) & 0xFFFFFFFF) | 1).bit_length() - 1


def dot(a, b):
    """adsp->scalarproduct_int16 (int32 wrapping accumulate)."""
    s = 0
    for x, y in zip(a, b):
        s = wrap32(s + int(x) * int(y))
    return s


def abs16u(v):
    """abs with -32768 -> 32768 (matches the neg/cmovs idiom)."""
    return 32768 if v == -32768 else abs(int(v))


def interpolate(in_arr, base, filt_off, precision, frac, filt_len, length):
    """ff_acelp_interpolate exact (validated for the adaptive codebook)."""
    out = np.zeros(length, np.int64)
    for n in range(length):
        v = 0x4000
        idx = 0
        i = 0
        while i < filt_len:
            v += int(in_arr[base + n + i]) * PF_FILT[filt_off + idx + frac]
            idx += precision
            i += 1
            v += int(in_arr[base + n - i]) * PF_FILT[filt_off + idx - frac]
        out[n] = sat16(v >> 15)
    return out


def weighted_vector_sum(a, b, wa, wb, rounder, shift):
    return [sat16((int(x) * wa + int(y) * wb + rounder) >> shift)
            for x, y in zip(a, b)]


def lp_synthesis(coeffs, seq, hist):
    """ff_celp_lp_synthesis_filter (shift 0, rounder 0x800), saturating.

    hist: 10 past outputs (hist[-1] = most recent).  The accumulator is
    int32 with wraparound, and in[n] is added AFTER the >> 12 (asm
    5c8-62e) — the distinction matters exactly when the sum wraps."""
    out = list(hist)
    for x in seq:
        v = 0x800
        for k in range(1, 11):
            v -= coeffs[k - 1] * out[-k]
        out.append(sat16((wrap32(v) >> 12) + int(x)))
    return out[10:]


def postfilter(pitch_delay_int, voicing, ht_prev, lp, residual,
               res_filter_data, pos_filter_data, speech):
    """Exact ff_g729_postfilter. All buffers are mutated in place
    (python lists / int64 numpy arrays); returns (voicing, ht_prev)."""
    lp_gn = [(int(lp[i + 1]) * GN_POW[i] + 0x4000) >> 15 for i in range(10)]
    lp_gd = [(int(lp[i + 1]) * GD_POW[i] + 0x4000) >> 15 for i in range(10)]

    # ---- residual of A(z/gn), 16-bit wrapping add --------------------
    sp = list(res_filter_data[:10]) + [int(v) for v in speech]
    for i in range(SUB):
        acc = 0x800
        for k in range(1, 11):
            acc += lp_gn[k - 1] * sp[10 + i - k]
        residual[RES_PREV + i] = wrap16((wrap32(acc) >> 12) + sp[10 + i])
    res_filter_data[:10] = sp[-10:]

    filtered = False
    residual_filt = None

    # ---- normalization ----------------------------------------------
    t = 0
    for i in range(RES_PREV + SUB):
        t |= abs16u(residual[i])
    if t == 0:
        shift = 3
    else:
        shift = bsr(t | 1) - 11
    if shift > 0:
        norm = [int(residual[i]) >> shift for i in range(RES_PREV + SUB)]
    else:
        norm = [wrap16(int(residual[i]) << (-shift))
                for i in range(RES_PREV + SUB)]

    while True:  # single pass; break-out emulates the asm's goto-950
        cur = norm[RES_PREV:RES_PREV + SUB]
        ener = dot(cur, cur)
        if ener == 0:
            break
        # integer lag search
        best_corr, best_delay = 0, pitch_delay_int - 1
        for T in (pitch_delay_int - 1, pitch_delay_int, pitch_delay_int + 1):
            c = dot(cur, norm[RES_PREV - T:RES_PREV - T + SUB])
            if c > best_corr:
                best_corr, best_delay = c, T
        if best_corr == 0:
            break
        dly = norm[RES_PREV - best_delay:RES_PREV - best_delay + SUB]
        en_int = dot(dly, dly)
        # 7 fractional candidates (2-tap short filter), 41 samples each
        bufs = [None]
        ens = [None]
        for label in range(1, 8):
            frac = 8 - label
            b = interpolate(norm, RES_PREV - best_delay, 64, 8, frac, 2, 41)
            e = dot(b[1:40], b[1:40])
            ens.append((wrap32(e + int(b[0]) ** 2),
                        wrap32(e + int(b[40]) ** 2)))
            bufs.append(b)
        maxen = en_int
        for e0, e1 in ens[1:]:
            maxen = max(maxen, e0 if e0 > e1 else e1)
        sh_max = 17 - (31 - bsr(maxen | 1))
        if sh_max < 0:
            break
        sh_ener = max(0, 17 - (31 - bsr(ener | 1)))
        S = max(sh_max, sh_ener)
        en_int_n = int(en_int) >> (sh_max & 31)
        corr_int_n = wrap16(best_corr >> (S & 31))
        best = dict(win=1, label=0, corr_n=corr_int_n,
                    corr_sq=wrap32(corr_int_n * corr_int_n), en_n=en_int_n)
        for label in range(1, 8):
            for win in (0, 1):
                ck = dot(bufs[label][win:win + SUB], cur)
                ck >>= (S & 31)
                if ck < 0:
                    ck = 0
                ck = wrap16(ck)
                cksq = wrap32(ck * ck)
                ek = wrap16(ens[label][win] >> (sh_max & 31))
                lhs = (cksq * best["en_n"]) >> 15
                rhs = (best["corr_sq"] * ek) >> 15
                if lhs > rhs:
                    best = dict(win=win, label=label, corr_n=ck,
                                corr_sq=cksq, en_n=ek)
        # threshold corr^2*2 >= ener*en (in normalized shifts)
        lhs = best["corr_sq"] << (2 * S + 1)
        ener_n = wrap32(ener) >> (sh_ener & 31)
        rhs = (ener_n * best["en_n"]) << (sh_ener + sh_max)
        if lhs < rhs or best["corr_n"] == 0:
            break
        if best["label"] == 0:
            delay = best_delay + 1 - best["win"]
            src = [int(residual[RES_PREV - delay + i]) for i in range(SUB)]
            corr_n, en_n, shB, shA = best["corr_n"], best["en_n"], S, sh_max
        else:
            # 8-tap re-interpolation on the normalized residual
            rf = interpolate(norm, RES_PREV - best_delay + best["win"], 0,
                             8, 8 - best["label"], 8, 41)
            corr_f = dot(rf[:SUB], cur)
            if corr_f < 0:
                sh2, corr_f_n16, r_frac = 0, 0, 0
            else:
                sh2 = max(0, bsr(corr_f | 1) - 14)
                corr_f_n16 = wrap16(corr_f >> sh2)
                r_frac = wrap32((corr_f_n16 * corr_f_n16 * best["en_n"])
                                >> 15)
            en_f = dot(rf[:SUB], rf[:SUB])
            sh3 = max(0, bsr(en_f | 1) - 14)
            en_f_n16 = wrap16(en_f >> sh3)
            r_int = wrap32((best["corr_n"] * best["corr_n"] * en_f_n16)
                           >> 15)
            sh_delta = sh_max + 2 * (sh2 - S) - sh3
            if sh_delta > 0:
                r_int >>= (sh_delta & 31)
            else:
                r_frac >>= min(31, -sh_delta)
            if r_int < r_frac:
                src = [int(v) for v in rf[:SUB]]
                corr_n, en_n, shA, shB = corr_f_n16, en_f_n16, sh3, sh2
            else:
                b = bufs[best["label"]]
                src = [int(b[best["win"] + i]) for i in range(SUB)]
                corr_n, en_n = best["corr_n"], best["en_n"]
                shA, shB = sh_max, S
            # denormalize candidate in place
            if shift > 0:
                src = [wrap16(v << shift) for v in src]
            else:
                src = [v >> (-shift) for v in src]
        en64 = en_n << (shA & 63)
        corr64 = corr_n << (shB & 63)
        den = en64 + (corr64 >> 1)
        w_cur = cdiv(en64 << 15, den)
        if w_cur < 0x5555:
            w_cur = 0x5555
        w_del = wrap16(0x8000 - w_cur)
        w_cur = wrap16(w_cur)
        residual_filt = weighted_vector_sum(
            [int(residual[RES_PREV + i]) for i in range(SUB)], src,
            w_cur, w_del, 0x4000, 15)
        filtered = True
        break

    if not filtered:
        residual_filt = [int(residual[RES_PREV + i]) for i in range(SUB)]
    voicing = max(voicing, 1 if filtered else 0)
    # shift residual memory
    for i in range(RES_PREV):
        residual[i] = residual[SUB + i]

    # ---- hf impulse response + tilt factors --------------------------
    hf = [0] * 33
    hf[10] = 4096
    hf[11:21] = lp_gn
    hf[11:33] = lp_synthesis(lp_gd, hf[11:33], hf[1:11])
    rh0 = dot(hf[10:30], hf[10:30])
    rh1 = dot(hf[10:30], hf[11:31])
    k = bsr(rh0 | 1) - 14
    if k > 0:
        rh0 >>= k
        rh1 = wrap32(rh1) >> k
    tsum = sum(abs16u(v) for v in hf[10:30])
    if tsum > 0x1003:
        f2 = cdiv(0x2000000, tsum >> 2)
        residual_filt = [wrap16(wrap32(v * f2 + 0x4000) >> 15)
                         for v in residual_filt]

    if abs(rh1) > rh0 or rh0 == 0:
        gt_half, r10, fact, rnd, shc = 0, 0, 0x800, 0x400, 11
    else:
        rc = wrap16(cdiv(wrap32(-wrap32(rh1) << 15), rh0))
        if rc > 0:
            p = rc * 0x199A + 0x4000
            gt, gt_half = p >> 15, p >> 16
            fact = cdiv(0x20000000, wrap16(0x8000 - gt)) if gt else 0x4000
            rnd, shc = 0x2000, 14
        else:
            p = wrap32(rc * 0x7333 + 0x4000)
            gt, gt_half = p >> 15, p >> 16
            fact = cdiv(0x4000000, wrap16(0x8000 + gt)) if gt else 0x800
            rnd, shc = 0x400, 11
        r10 = (2 * (int(ht_prev) * gt_half) + 0x4000) >> 15

    # ---- short-term 1/A(z/gd) ----------------------------------------
    pos10 = lp_synthesis(lp_gd, residual_filt, pos_filter_data[:10])
    pos_filter_data[10:50] = pos10
    pos_filter_data[0:10] = pos10[30:40]
    last = pos10[39]
    for i in range(SUB - 1, 0, -1):
        tilt = wrap32(2 * (pos10[i - 1] * gt_half) + 0x4000) >> 15
        speech[i] = wrap16(wrap32(wrap32(pos10[i] + tilt) * fact + rnd)
                           >> shc)
    speech[0] = wrap16(wrap32(wrap32(pos10[0] + r10) * fact + rnd) >> shc)
    return voicing, last


def adaptive_gain_control(gain_before, gain_after, speech, gain_prev):
    """Exact ff_g729_adaptive_gain_control."""
    if gain_after == 0 and gain_before != 0:
        return 0
    gain0 = 0
    if gain_before != 0:
        clz_b = 31 - bsr(gain_before | 1)
        sh_b = clz_b - 17
        nb = gain_before << sh_b if sh_b >= 0 else gain_before >> (-sh_b)
        clz_a = 31 - bsr(gain_after | 1)
        sh_a = clz_a - 17
        na = gain_after << sh_a if sh_a >= 0 else gain_after >> (-sh_a)
        d = clz_a - clz_b
        if nb < na:
            g = cdiv(wrap32(nb << 15), na)
            g = wrap32(g << ((d - 1) & 31)) if d - 1 >= 0 \
                else g >> (clz_b + 1 - clz_a)
        else:
            g = cdiv(wrap32((nb - na) << 14), na) + 0x4000
            g = wrap32(g << (d & 31)) if d >= 0 else (g & 0xFFFFFFFF) >> (-d)
        if not (0 <= g <= 0x7FFF):
            g = 0x7FFF if (g & 0xFFFFFFFF) > 0x7FFF else g
        gain0 = (g * 0x19A + 0x4000) >> 15
    g = int(gain_prev)
    for i in range(len(speech)):
        g = ((wrap16(g) * 0x7E66 + 0x4000) >> 15) + gain0
        speech[i] = sat16((int(speech[i]) * wrap16(g) + 0x2000) >> 14)
    return wrap16(g)
