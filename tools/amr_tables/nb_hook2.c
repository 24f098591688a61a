/* LD_PRELOAD interceptor v2 for the NB exact-decoder campaign.
 *
 * Hooks the cross-object helpers amrnbdec.o calls through the PLT:
 *   ff_weighted_vector_sumf(out, in_a, in_b, w_a, w_b, len)
 *     -> record tag 'W': len, w_a, w_b, in_a[len], in_b[len]
 *   ff_acelp_interpolatef(out, in, filter, precision, frac_pos,
 *                         filter_length, length)
 *     -> record tag 'I': length, (out-in) as int (= lag-1 when out is
 *        the excitation head), precision, frac_pos, filter_length,
 *        then the computed output[length]
 *   ff_set_fixed_vector(out, in(AMRFixed*), scale, size)
 *     -> record tag 'F': size, scale, n, x[n], y[n] from the sparse
 *
 * All three are re-implemented faithfully (plain C reference bodies)
 * because RTLD_NEXT cannot reach libavcodec under ctypes RTLD_LOCAL.
 * AMRFixed layout (lavc acelp_vectors.h): int n; int x[10]; float y[10];
 * int no_repeat_mask; int pitch_lag; float pitch_fac;
 *
 * Build: gcc -shared -fPIC -O2 -ffp-contract=off -o /tmp/nbdis/nb_hook2.so \
 *        nb_hook2.c
 * Use:   HOOK_OUT=... LD_PRELOAD=/tmp/nbdis/nb_hook2.so python ...
 */
#include <stdio.h>
#include <stdlib.h>

static FILE *out_f;

static FILE *hf(void) {
    if (!out_f) {
        const char *p = getenv("HOOK_OUT");
        out_f = fopen(p ? p : "/tmp/dots2.bin", "ab");
    }
    return out_f;
}

typedef struct AMRFixed {
    int n;
    int x[10];
    float y[10];
    int no_repeat_mask;
    int pitch_lag;
    float pitch_fac;
} AMRFixed;

void ff_weighted_vector_sumf(float *out, const float *in_a,
                             const float *in_b, float weight_coeff_a,
                             float weight_coeff_b, int length) {
    FILE *f = hf();
    char tag = 'W';
    fwrite(&tag, 1, 1, f);
    fwrite(&length, 4, 1, f);
    fwrite(&weight_coeff_a, 4, 1, f);
    fwrite(&weight_coeff_b, 4, 1, f);
    fwrite(in_a, 4, length, f);
    fwrite(in_b, 4, length, f);
    fflush(f);
    for (int i = 0; i < length; i++)
        out[i] = weight_coeff_a * in_a[i] + weight_coeff_b * in_b[i];
}

void ff_acelp_interpolatef(float *out, const float *in,
                           const float *filter_coeffs, int precision,
                           int frac_pos, int filter_length, int length) {
    for (int n = 0; n < length; n++) {
        int idx = 0;
        float v = 0;
        for (int i = 0; i < filter_length;) {
            v += in[n + i] * filter_coeffs[idx + frac_pos];
            idx += precision;
            i++;
            v += in[n - i] * filter_coeffs[idx - frac_pos];
        }
        out[n] = v;
    }
    FILE *f = hf();
    char tag = 'I';
    int delta = (int)(out - in);
    fwrite(&tag, 1, 1, f);
    fwrite(&length, 4, 1, f);
    fwrite(&delta, 4, 1, f);
    fwrite(&precision, 4, 1, f);
    fwrite(&frac_pos, 4, 1, f);
    fwrite(&filter_length, 4, 1, f);
    fwrite(out, 4, length, f);
    fflush(f);
}

void ff_set_fixed_vector(float *out, const AMRFixed *in, float scale,
                         int size) {
    FILE *f = hf();
    char tag = 'F';
    fwrite(&tag, 1, 1, f);
    fwrite(&size, 4, 1, f);
    fwrite(&scale, 4, 1, f);
    fwrite(&in->n, 4, 1, f);
    fwrite(&in->pitch_lag, 4, 1, f);
    fwrite(&in->pitch_fac, 4, 1, f);
    fwrite(in->x, 4, in->n, f);
    fwrite(in->y, 4, in->n, f);
    fflush(f);
    for (int i = 0; i < in->n; i++) {
        int x = in->x[i], next_x;
        float y = in->y[i] * scale;
        if (in->pitch_lag > 0)
            while ((next_x = x + in->pitch_lag) < size) {
                out[x] += y;
                y *= in->pitch_fac;
                x = next_x;
            }
        out[x] += y;
    }
}
