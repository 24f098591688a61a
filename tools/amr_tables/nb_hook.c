/* LD_PRELOAD interceptor on avpriv_scalarproduct_float_c for the NB
 * exact-decoder campaign (same route as the WB lab's hooks).
 *
 * Records every call: int32 len, int32 same(v1==v2), float v1[len],
 * [float v2[len] if !same], float result — appended to $HOOK_OUT.
 *
 * Build: gcc -shared -fPIC -O2 -o /tmp/nbdis/nb_hook.so nb_hook.c -ldl
 * Use:   HOOK_OUT=/tmp/nbdis/dots.bin LD_PRELOAD=/tmp/nbdis/nb_hook.so \
 *        python <script that decodes frames via the lavc oracle>
 */
#define _GNU_SOURCE
#include <dlfcn.h>
#include <stdio.h>
#include <stdlib.h>

static FILE *out;

float avpriv_scalarproduct_float_c(const float *v1, const float *v2,
                                   int len) {
    /* The reference C implementation (float accumulator), inlined:
     * dlsym(RTLD_NEXT) can't reach the real symbol when libavcodec is
     * dlopen'd RTLD_LOCAL by ctypes. */
    float r = 0.f;
    for (int i = 0; i < len; i++)
        r += v1[i] * v2[i];
    if (!out) {
        const char *p = getenv("HOOK_OUT");
        out = fopen(p ? p : "/tmp/dots.bin", "ab");
    }
    int same = (v1 == v2);
    fwrite(&len, 4, 1, out);
    fwrite(&same, 4, 1, out);
    fwrite(v1, 4, len, out);
    if (!same)
        fwrite(v2, 4, len, out);
    fwrite(&r, 4, 1, out);
    fflush(out);
    return r;
}
