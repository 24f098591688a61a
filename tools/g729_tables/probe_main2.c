/* fork-isolated variant: each request runs in a forked child so any
 * memory scribble by the probed functions dies with the child. */
#include <stdint.h>
#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include <unistd.h>
#include <sys/wait.h>

#define SUBFRAME 40
#define RESBUF 320
#define RFD 64
#define PFD 64

typedef struct AudioDSPContext {
    int32_t (*scalarproduct_int16)(const int16_t *v1, const int16_t *v2, int len);
    void *pad[7];
} AudioDSPContext;

void ff_g729_postfilter(AudioDSPContext *adsp, int16_t *ht_prev_data, int *voicing,
                        const int16_t *lp_filter_coeffs, int pitch_delay_int,
                        int16_t *residual, int16_t *res_filter_data,
                        int16_t *pos_filter_data, int16_t *speech, int subframe_size);
int16_t ff_g729_adaptive_gain_control(int gain_before, int gain_after, int16_t *speech,
                                      int length, int16_t gain_prev);
void ff_acelp_lsp2lpc(int16_t *lp, const int16_t *lsp, int lp_half_order);
void ff_acelp_lp_decode(int16_t *lp_1st, int16_t *lp_2nd, const int16_t *lsp_2nd,
                        const int16_t *lsp_prev, int lp_order);
int ff_celp_lp_synthesis_filter(int16_t *out, const int16_t *coef, const int16_t *in,
                                int buflen, int filtlen, int stop, int shift, int rounder);
void ff_acelp_reorder_lsf(int16_t *lsfq, int lsfq_min_distance, int lsfq_min,
                          int lsfq_max, int lp_order);
void ff_acelp_lsf2lsp(int16_t *lsp, const int16_t *lsf, int lp_order);
int ff_log2_q15(unsigned int value);

static int32_t sp_int16(const int16_t *v1, const int16_t *v2, int len) {
    int32_t res = 0;
    for (int i = 0; i < len; i++) res += (int32_t)v1[i] * v2[i];
    return res;
}
void av_log(void *c, int l, const char *f, ...) { (void)c; (void)l; (void)f; }
float avpriv_scalarproduct_float_c(const float *a, const float *b, int n) {
    float s = 0; for (int i = 0; i < n; i++) s += a[i] * b[i]; return s;
}
static void rd(void *p, size_t n) {
    size_t got = 0; char *c = p;
    while (got < n) { ssize_t r = read(0, c + got, n - got); if (r <= 0) exit(0); got += r; }
}
static void wrr(const void *p, size_t n) {
    size_t put = 0; const char *c = p;
    while (put < n) { ssize_t r = write(1, c + put, n - put); if (r <= 0) exit(1); put += r; }
}

struct preq { int32_t pdi, voicing; int16_t htp; int16_t lp[11];
              int16_t res[RESBUF]; int16_t rfd[RFD]; int16_t pfd[PFD];
              int16_t sp[SUBFRAME]; } __attribute__((packed));
struct areq { int32_t gb, ga; int16_t gp; int16_t sp[SUBFRAME]; } __attribute__((packed));

int main(int argc, char **argv) {
    int pad = argc > 1 ? atoi(argv[1]) : 64;  /* layout-shift knob */
    for (;;) {
        uint8_t op;
        rd(&op, 1);
        if (op == 'P') {
            struct preq q; rd(&q, sizeof q);
            pid_t pid = fork();
            if (pid == 0) {
                AudioDSPContext adsp = { sp_int16, {0} };
                int16_t *mem = calloc(RESBUF + RFD + PFD + SUBFRAME + 8 * 1024 + pad, 2);
                int16_t *res = mem + pad, *rfd = res + RESBUF + 1024,
                        *pfd = rfd + RFD + 1024, *sp = pfd + PFD + 1024;
                memcpy(res, q.res, sizeof q.res); memcpy(rfd, q.rfd, sizeof q.rfd);
                memcpy(pfd, q.pfd, sizeof q.pfd); memcpy(sp, q.sp, sizeof q.sp);
                int voicing = q.voicing; int16_t htp = q.htp;
                ff_g729_postfilter(&adsp, &htp, &voicing, q.lp, q.pdi,
                                   res, rfd, pfd, sp, SUBFRAME);
                wrr(&voicing, 4); wrr(&htp, 2);
                wrr(res, RESBUF * 2); wrr(rfd, RFD * 2); wrr(pfd, PFD * 2);
                wrr(sp, SUBFRAME * 2);
                _exit(0);
            }
            int st; waitpid(pid, &st, 0);
            fprintf(stderr, "child st=%x\n", st);
            if (!WIFEXITED(st) || WEXITSTATUS(st)) {  /* crashed: emit sentinel */
                char z[982]; memset(z, 0x7e, sizeof z); wrr(z, sizeof z);
            }
        } else if (op == 'A') {
            struct areq q; rd(&q, sizeof q);
            pid_t pid = fork();
            if (pid == 0) {
                int16_t g = ff_g729_adaptive_gain_control(q.gb, q.ga, q.sp, SUBFRAME, q.gp);
                wrr(&g, 2); wrr(q.sp, SUBFRAME * 2);
                _exit(0);
            }
            int st; waitpid(pid, &st, 0);
            if (!WIFEXITED(st) || WEXITSTATUS(st)) {
                char z[82]; memset(z, 0x7e, sizeof z); wrr(z, sizeof z);
            }
        } else if (op == 'L') {
            int16_t lsp[10];
            rd(lsp, sizeof lsp);
            pid_t pid = fork();
            if (pid == 0) {
                static int16_t lp[16];
                ff_acelp_lsp2lpc(lp, lsp, 5);
                wrr(lp, 22);
                _exit(0);
            }
            int st; waitpid(pid, &st, 0);
            if (!WIFEXITED(st) || WEXITSTATUS(st)) {
                char z[22]; memset(z, 0x7e, sizeof z); wrr(z, sizeof z);
            }
        } else if (op == 'D') {
            int16_t lsp2[10], lspp[10];
            rd(lsp2, sizeof lsp2); rd(lspp, sizeof lspp);
            pid_t pid = fork();
            if (pid == 0) {
                static int16_t lp1[16], lp2b[16];
                ff_acelp_lp_decode(lp1, lp2b, lsp2, lspp, 10);
                wrr(lp1, 22); wrr(lp2b, 22);
                _exit(0);
            }
            int st; waitpid(pid, &st, 0);
            if (!WIFEXITED(st) || WEXITSTATUS(st)) {
                char z[44]; memset(z, 0x7e, sizeof z); wrr(z, sizeof z);
            }
        } else if (op == 'S') {
            int16_t coef[10], in[40], hist[10];
            rd(coef, sizeof coef); rd(in, sizeof in); rd(hist, sizeof hist);
            pid_t pid = fork();
            if (pid == 0) {
                static int16_t buf[64];
                memcpy(buf, hist, 20);
                int rc = ff_celp_lp_synthesis_filter(buf + 10, coef, in, 40, 10, 1, 0, 0x800);
                int32_t rc32 = rc;
                wrr(&rc32, 4); wrr(buf + 10, 80);
                _exit(0);
            }
            int st; waitpid(pid, &st, 0);
            if (!WIFEXITED(st) || WEXITSTATUS(st)) {
                char z[84]; memset(z, 0x7e, sizeof z); wrr(z, sizeof z);
            }
        } else if (op == 'R') {
            int16_t lsf[10];
            rd(lsf, sizeof lsf);
            pid_t pid = fork();
            if (pid == 0) {
                ff_acelp_reorder_lsf(lsf, 321, 40, 25681, 10);
                wrr(lsf, 20);
                _exit(0);
            }
            int st; waitpid(pid, &st, 0);
            if (!WIFEXITED(st) || WEXITSTATUS(st)) {
                char z[20]; memset(z, 0x7e, sizeof z); wrr(z, sizeof z);
            }
        } else if (op == 'F') {
            int16_t lsf[10];
            rd(lsf, sizeof lsf);
            pid_t pid = fork();
            if (pid == 0) {
                static int16_t lsp[10];
                ff_acelp_lsf2lsp(lsp, lsf, 10);
                wrr(lsp, 20);
                _exit(0);
            }
            int st; waitpid(pid, &st, 0);
            if (!WIFEXITED(st) || WEXITSTATUS(st)) {
                char z[20]; memset(z, 0x7e, sizeof z); wrr(z, sizeof z);
            }
        } else if (op == 'G') {
            uint32_t v;
            rd(&v, 4);
            pid_t pid = fork();
            if (pid == 0) {
                int32_t r = ff_log2_q15(v);
                wrr(&r, 4);
                _exit(0);
            }
            int st; waitpid(pid, &st, 0);
            if (!WIFEXITED(st) || WEXITSTATUS(st)) {
                char z[4]; memset(z, 0x7e, sizeof z); wrr(z, sizeof z);
            }
        } else break;
    }
    return 0;
}
