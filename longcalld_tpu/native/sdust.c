/* SDUST low-complexity masking (Morgulis et al. 2006), C implementation.
 *
 * Native replacement for longcalld_tpu.utils.sdust._sdust_core (same
 * algorithm, same outputs): symmetric DUST over 3-mers with window W and
 * score threshold T; emits 0-based half-open masked intervals.
 *
 * Compiled as a small shared library driven through ctypes; the Python
 * fallback remains for environments without a compiler.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define WLEN 3
#define WTOT 64

typedef struct { int start, finish, r, l; } PerfectIv;

typedef struct {
    int64_t *res;        /* packed (start << 32 | end) */
    int n_res, m_res;
    PerfectIv *P;        /* sorted by start descending */
    int n_P, m_P;
    int *win;            /* queue of 3-mer codes */
    int win_front, win_count, win_cap;
} SdCtx;

static void res_push(SdCtx *c, int s, int e) {
    if (c->n_res == c->m_res) {
        c->m_res = c->m_res ? c->m_res * 2 : 64;
        c->res = (int64_t *)realloc(c->res, c->m_res * sizeof(int64_t));
    }
    c->res[c->n_res++] = ((int64_t)s << 32) | (uint32_t)e;
}

static int win_at(SdCtx *c, int i) { return c->win[c->win_front + i]; }

static void save_masked(SdCtx *c, int start) {
    int i, saved = 0;
    PerfectIv *p;
    if (c->n_P == 0 || c->P[c->n_P - 1].start >= start) return;
    p = &c->P[c->n_P - 1];
    if (c->n_res) {
        int s = (int)(c->res[c->n_res - 1] >> 32);
        int f = (int)(uint32_t)c->res[c->n_res - 1];
        if (p->start <= f) {
            saved = 1;
            c->res[c->n_res - 1] =
                ((int64_t)s << 32) | (uint32_t)(f > p->finish ? f : p->finish);
        }
    }
    if (!saved) res_push(c, p->start, p->finish);
    for (i = c->n_P - 1; i >= 0 && c->P[i].start < start; --i) {}
    c->n_P = i + 1;
}

static void shift_window(SdCtx *c, int t, int T, int W, int *L, int *rw,
                         int *rv, int *cw, int *cv) {
    int s;
    if (c->win_count >= W - WLEN + 1) {
        s = c->win[c->win_front++];
        c->win_count--;
        (*rw) -= --cw[s];
        if (*L > c->win_count) { --(*L); (*rv) -= --cv[s]; }
    }
    if (c->win_front + c->win_count == c->win_cap) {
        memmove(c->win, c->win + c->win_front, c->win_count * sizeof(int));
        c->win_front = 0;
    }
    c->win[c->win_front + c->win_count++] = t;
    ++(*L);
    (*rw) += cw[t]++;
    (*rv) += cv[t]++;
    if (cv[t] * 10 > (T << 1)) {
        do {
            s = win_at(c, c->win_count - *L);
            (*rv) -= --cv[s];
            --(*L);
        } while (s != t);
    }
}

static void find_perfect(SdCtx *c, int T, int start, int L, int rv,
                         const int *cv) {
    int cc[WTOT], r = rv, i, j, max_r = 0, max_l = 0;
    memcpy(cc, cv, sizeof(cc));
    for (i = c->win_count - L - 1; i >= 0; --i) {
        int t = win_at(c, i), new_r, new_l;
        r += cc[t]++;
        new_r = r;
        new_l = c->win_count - i - 1;
        if (new_r * 10 > T * new_l) {
            for (j = 0; j < c->n_P && c->P[j].start >= i + start; ++j) {
                PerfectIv *p = &c->P[j];
                if (max_r == 0 || (int64_t)p->r * max_l > (int64_t)max_r * p->l) {
                    max_r = p->r;
                    max_l = p->l;
                }
            }
            if (max_r == 0 || (int64_t)new_r * max_l >= (int64_t)max_r * new_l) {
                max_r = new_r;
                max_l = new_l;
                if (c->n_P == c->m_P) {
                    c->m_P = c->m_P ? c->m_P * 2 : 64;
                    c->P = (PerfectIv *)realloc(c->P, c->m_P * sizeof(PerfectIv));
                }
                memmove(&c->P[j + 1], &c->P[j], (c->n_P - j) * sizeof(PerfectIv));
                c->n_P++;
                c->P[j].start = i + start;
                c->P[j].finish = c->win_count + (WLEN - 1) + start;
                c->P[j].r = new_r;
                c->P[j].l = new_l;
            }
        }
    }
}

/* seq4: nt4 codes (0-3 bases, >=4 breaks); returns number of intervals,
 * intervals written to out as (start, end) pairs (caller frees via
 * sdust_free). */
int64_t *sdust_mask(const uint8_t *seq4, int n, int T, int W, int *n_out) {
    SdCtx c;
    int cv[WTOT], cw[WTOT];
    int rv = 0, rw = 0, L = 0, i, l, t = 0, start;
    memset(&c, 0, sizeof(c));
    c.win_cap = 2 * (W + 8);
    c.win = (int *)malloc(c.win_cap * sizeof(int));
    memset(cv, 0, sizeof(cv));
    memset(cw, 0, sizeof(cw));
    for (i = l = 0; i <= n; ++i) {
        int b = i < n ? seq4[i] : 4;
        if (b < 4) {
            ++l;
            t = ((t << 2) | b) & (WTOT - 1);
            if (l >= WLEN) {
                start = (l - W > 0 ? l - W : 0) + (i + 1 - l);
                save_masked(&c, start);
                shift_window(&c, t, T, W, &L, &rw, &rv, cw, cv);
                if (rw * 10 > L * T) find_perfect(&c, T, start, L, rv, cv);
            }
        } else {
            start = (l - W + 1 > 0 ? l - W + 1 : 0) + (i + 1 - l);
            while (c.n_P) save_masked(&c, start++);
            /* NB: like the reference, only l/t reset at an N — the window
             * state deliberately persists (sdust.c N-branch). */
            l = 0; t = 0;
        }
    }
    free(c.win);
    free(c.P);
    *n_out = c.n_res;
    return c.res;
}

void sdust_free(int64_t *p) { free(p); }
