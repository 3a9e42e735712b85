/*
 * Fused per-block coding kernel for the host-side conformant pass:
 * forward transform -> quantize_b -> eob -> dequant -> inverse
 * transform -> reconstruction, in one call.
 *
 * The sequential encode pass is the one place the TPU build keeps a
 * native host component, mirroring the reference's role split (SURVEY
 * §7: serial CPU hot loop).  All math reproduces ops/transforms.py
 * (fwd_txfm2d / inv_txfm2d_add) and ops/quant.py (quantize_b) bit for
 * bit — the butterfly networks come from the same extracted stage
 * tables (ops/data/txfm_stages.npz), not from the reference's C.
 * Equivalence is enforced by tests/test_native_block.py.
 *
 * Python-facing API:
 *   plan = make_plan(ints_tuple, arrays_tuple)   -> capsule
 *   code_block(plan, resid_i32, pred_i32, qc_out_i32, recon_out_i32)
 *       -> eob (int)
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

#define KIND_NET 0
#define KIND_IDTX 1
#define KIND_ADST4 2

#define MAXN 64

typedef struct {
    const int32_t *stmts;   /* [k, 5] */
    const int32_t *offs;    /* [s+1] */
    const int8_t *clamp;    /* [k] */
    const int32_t *cospi;   /* [64] */
    Py_ssize_t n_stages;
    int cos_bit;
    int kind;               /* KIND_* */
    int n;                  /* transform length */
} Net1d;

typedef struct {
    int w, h, bd;
    int fs0, fs1, fs2;      /* forward shift triple */
    int is0, is1;           /* inverse shifts */
    int fwd_flip_v, fwd_flip_h;
    int rect;               /* |log2(w/h)| == 1 */
    int inv_clamp_row, inv_clamp_col;
    Net1d fcol, frow, irow, icol;
    const int32_t *sinpi;   /* [5] for adst4 at the relevant bit */
    const int32_t *sinpi_inv;
    /* quant (column 0 = dc, 1 = ac), already log_scale-adjusted zbin/rnd */
    int32_t zbin[2], rnd[2], quant[2], qshift[2], dequant[2];
    int log_scale;
    const int16_t *scan;    /* [n_scan] over the ch x cw coef region */
    int n_scan, cw, ch;
    PyObject *refs;         /* keeps the backing arrays alive */
} Plan;

static void plan_free(PyObject *cap) {
    Plan *p = (Plan *)PyCapsule_GetPointer(cap, "block_plan");
    if (p) { Py_XDECREF(p->refs); PyMem_Free(p); }
}

static const void *buf_of(PyObject *seq, Py_ssize_t i) {
    PyObject *o = PyTuple_GET_ITEM(seq, i);
    Py_buffer view;
    if (PyObject_GetBuffer(o, &view, PyBUF_SIMPLE) < 0) return NULL;
    const void *p = view.buf;
    PyBuffer_Release(&view);   /* arrays stay alive via plan->refs */
    return p;
}

/* ints: w h bd fs0 fs1 fs2 is0 is1 fvflip fhflip rect icl_row icl_col
 *       fcol_cos fcol_kind frow_cos frow_kind irow_cos irow_kind
 *       icol_cos icol_kind log_scale n_scan cw ch
 * arrays: fcol(stmts offs clamp cospi) frow(...) irow(...) icol(...)
 *         sinpi_f sinpi_i zbin rnd quant qshift dequant scan          */
static PyObject *make_plan(PyObject *self, PyObject *args) {
    PyObject *ints, *arrays;
    if (!PyArg_ParseTuple(args, "OO", &ints, &arrays)) return NULL;
    Plan *p = (Plan *)PyMem_Calloc(1, sizeof(Plan));
    if (!p) return PyErr_NoMemory();
    long iv[25];
    for (int i = 0; i < 25; ++i)
        iv[i] = PyLong_AsLong(PyTuple_GET_ITEM(ints, i));
    p->w = iv[0]; p->h = iv[1]; p->bd = iv[2];
    p->fs0 = iv[3]; p->fs1 = iv[4]; p->fs2 = iv[5];
    p->is0 = iv[6]; p->is1 = iv[7];
    p->fwd_flip_v = iv[8]; p->fwd_flip_h = iv[9]; p->rect = iv[10];
    p->inv_clamp_row = iv[11]; p->inv_clamp_col = iv[12];
    Net1d *nets[4] = {&p->fcol, &p->frow, &p->irow, &p->icol};
    for (int k = 0; k < 4; ++k) {
        nets[k]->cos_bit = iv[13 + 2 * k];
        nets[k]->kind = iv[14 + 2 * k];
    }
    p->fcol.n = p->h; p->frow.n = p->w;
    p->irow.n = p->w; p->icol.n = p->h;
    p->log_scale = iv[21];
    p->n_scan = iv[22]; p->cw = iv[23]; p->ch = iv[24];

    for (int k = 0; k < 4; ++k) {
        nets[k]->stmts = (const int32_t *)buf_of(arrays, 4 * k + 0);
        nets[k]->offs = (const int32_t *)buf_of(arrays, 4 * k + 1);
        nets[k]->clamp = (const int8_t *)buf_of(arrays, 4 * k + 2);
        nets[k]->cospi = (const int32_t *)buf_of(arrays, 4 * k + 3);
        PyObject *offs_o = PyTuple_GET_ITEM(arrays, 4 * k + 1);
        Py_buffer v;
        PyObject_GetBuffer(offs_o, &v, PyBUF_SIMPLE);
        nets[k]->n_stages = v.len / 4 - 1;
        PyBuffer_Release(&v);
    }
    p->sinpi = (const int32_t *)buf_of(arrays, 16);
    p->sinpi_inv = (const int32_t *)buf_of(arrays, 17);
    const int32_t *q;
    q = (const int32_t *)buf_of(arrays, 18); p->zbin[0] = q[0]; p->zbin[1] = q[1];
    q = (const int32_t *)buf_of(arrays, 19); p->rnd[0] = q[0]; p->rnd[1] = q[1];
    q = (const int32_t *)buf_of(arrays, 20); p->quant[0] = q[0]; p->quant[1] = q[1];
    q = (const int32_t *)buf_of(arrays, 21); p->qshift[0] = q[0]; p->qshift[1] = q[1];
    q = (const int32_t *)buf_of(arrays, 22); p->dequant[0] = q[0]; p->dequant[1] = q[1];
    p->scan = (const int16_t *)buf_of(arrays, 23);
    Py_INCREF(arrays);
    p->refs = arrays;
    return PyCapsule_New(p, "block_plan", plan_free);
}

static inline int32_t wrap_mul(int32_t a, int32_t b) {
    return (int32_t)((uint32_t)a * (uint32_t)b);
}
static inline int32_t wrap_add(int32_t a, int32_t b) {
    return (int32_t)((uint32_t)a + (uint32_t)b);
}

/* svt_av1_round_shift_array: bit>0 rounds right, bit<0 multiplies */
static inline int32_t round_shift(int32_t x, int bit) {
    if (bit == 0) return x;
    if (bit > 0) return wrap_add(x, 1 << (bit - 1)) >> bit;
    return (int32_t)((uint32_t)x << (-bit));
}

#define NEW_SQRT2_BITS 12
#define NEW_SQRT2 5793
#define NEW_INV_SQRT2 2896

static inline int32_t mul_sqrt2_round(int32_t x, int32_t mult) {
    int32_t hi = x >> 15;
    int32_t lo = x - (int32_t)((uint32_t)hi << 15);
    return wrap_add(wrap_mul(hi, mult * 8),
                    wrap_add(wrap_mul(lo, mult), 1 << (NEW_SQRT2_BITS - 1))
                        >> NEW_SQRT2_BITS);
}

static void run_net(const Net1d *net, int32_t *x, int clamp_bit) {
    int32_t bufa[MAXN], bufb[MAXN];
    int32_t *cur = bufa, *nxt = bufb;
    memcpy(cur, x, net->n * sizeof(int32_t));
    int32_t rnd = 1 << (net->cos_bit - 1);
    int32_t cmax = clamp_bit > 0 ? (int32_t)((1u << (clamp_bit - 1)) - 1) : 0;
    int32_t cmin = clamp_bit > 0 ? (int32_t)(-(1 << (clamp_bit - 1))) : 0;
    Py_ssize_t n_out = net->offs[net->n_stages] - net->offs[net->n_stages - 1];
    for (Py_ssize_t s = 0; s < net->n_stages; ++s) {
        const int32_t *st = net->stmts + net->offs[s] * 5;
        const int8_t *cl = net->clamp + net->offs[s];
        Py_ssize_t m = net->offs[s + 1] - net->offs[s];
        for (Py_ssize_t i = 0; i < m; ++i) {
            int kind = st[i * 5 + 0];
            int32_t ca = st[i * 5 + 1], ia = st[i * 5 + 2];
            int32_t cb = st[i * 5 + 3], ib = st[i * 5 + 4];
            int32_t v;
            if (kind == 1) {
                int32_t wa = ca < 0 ? -net->cospi[-ca - 1] : net->cospi[ca - 1];
                int32_t wb = cb < 0 ? -net->cospi[-cb - 1]
                           : (cb > 0 ? net->cospi[cb - 1] : 0);
                v = wrap_add(wrap_add(wrap_mul(wa, cur[ia]),
                                      wrap_mul(wb, cur[ib])), rnd)
                    >> net->cos_bit;
            } else {
                v = wrap_add(wrap_mul(ca, cur[ia]), wrap_mul(cb, cur[ib]));
                if (clamp_bit > 0 && cl[i]) {
                    if (v > cmax) v = cmax;
                    else if (v < cmin) v = cmin;
                }
            }
            nxt[i] = v;
        }
        int32_t *t = cur; cur = nxt; nxt = t;
    }
    memcpy(x, cur, n_out * sizeof(int32_t));
}

static void run_idtx(int32_t *x, int n) {
    switch (n) {
    case 4:
        for (int i = 0; i < 4; ++i) x[i] = mul_sqrt2_round(x[i], NEW_SQRT2);
        break;
    case 8:
        for (int i = 0; i < 8; ++i) x[i] = wrap_mul(x[i], 2);
        break;
    case 16:
        for (int i = 0; i < 16; ++i)
            x[i] = mul_sqrt2_round(x[i], 2 * NEW_SQRT2);
        break;
    case 32:
        for (int i = 0; i < 32; ++i) x[i] = wrap_mul(x[i], 4);
        break;
    }
}

static void run_adst4(int32_t *x, const int32_t *sp, int bit, int inverse) {
    int32_t x0 = x[0], x1 = x[1], x2 = x[2], x3 = x[3];
    int32_t o0, o1, o2, o3;
    if (inverse) {
        int32_t s0 = wrap_mul(sp[1], x0);
        int32_t s1 = wrap_mul(sp[2], x0);
        int32_t s2 = wrap_mul(sp[3], x1);
        int32_t s3 = wrap_mul(sp[4], x2);
        int32_t s4 = wrap_mul(sp[1], x2);
        int32_t s5 = wrap_mul(sp[2], x3);
        int32_t s6 = wrap_mul(sp[4], x3);
        int32_t s7 = wrap_add(x0 - x2, x3);
        s0 = wrap_add(s0, s3);
        s1 = s1 - s4;
        s3 = s2;                     /* python: s3 takes the OLD s2 */
        s2 = wrap_mul(sp[3], s7);
        s0 = wrap_add(s0, s5);
        s1 = s1 - s6;
        o0 = wrap_add(s0, s3);
        o1 = wrap_add(s1, s3);
        o2 = s2;
        o3 = wrap_add(s0, s1) - s3;
    } else {
        int32_t s0 = wrap_mul(sp[1], x0);
        int32_t s1 = wrap_mul(sp[4], x0);
        int32_t s2 = wrap_mul(sp[2], x1);
        int32_t s3 = wrap_mul(sp[1], x1);
        int32_t s4 = wrap_mul(sp[3], x2);
        int32_t s5 = wrap_mul(sp[4], x3);
        int32_t s6 = wrap_mul(sp[2], x3);
        int32_t s7 = wrap_add(x0, x1) - x3;
        int32_t t0 = wrap_add(wrap_add(s0, s2), s5);
        int32_t t1 = wrap_mul(sp[3], s7);
        int32_t t2 = wrap_add(s1 - s3, s6);
        int32_t t3 = s4;
        o0 = wrap_add(t0, t3);
        o1 = t1;
        o2 = t2 - t3;
        o3 = wrap_add(t2 - t0, t3);
    }
    x[0] = round_shift(o0, bit);
    x[1] = round_shift(o1, bit);
    x[2] = round_shift(o2, bit);
    x[3] = round_shift(o3, bit);
}

static void run_1d(const Net1d *net, const int32_t *sinpi, int32_t *x,
                   int clamp_bit, int inverse) {
    if (net->kind == KIND_IDTX) run_idtx(x, net->n);
    else if (net->kind == KIND_ADST4)
        run_adst4(x, sinpi, net->cos_bit, inverse);
    else run_net(net, x, clamp_bit);
}

static inline int32_t clampi(int32_t v, int32_t lo, int32_t hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

static PyObject *code_block(PyObject *self, PyObject *args) {
    PyObject *cap;
    Py_buffer rv, pv, qv, ov;
    if (!PyArg_ParseTuple(args, "Oy*y*w*w*", &cap, &rv, &pv, &qv, &ov))
        return NULL;
    Plan *p = (Plan *)PyCapsule_GetPointer(cap, "block_plan");
    if (!p) goto fail;
    const int32_t *resid = (const int32_t *)rv.buf;
    const int32_t *pred = (const int32_t *)pv.buf;
    int32_t *qc_out = (int32_t *)qv.buf;
    int32_t *rec_out = (int32_t *)ov.buf;
    int w = p->w, h = p->h;

    static int32_t buf[MAXN * MAXN], tbuf[MAXN * MAXN], dq[MAXN * MAXN];
    int32_t col[MAXN];

    /* ---- forward: column pass (over h), then row pass (over w) ---- */
    for (int i = 0; i < h * w; ++i) buf[i] = resid[i];
    if (p->fwd_flip_v)
        for (int r = 0; r < h / 2; ++r)
            for (int c = 0; c < w; ++c) {
                int32_t t = buf[r * w + c];
                buf[r * w + c] = buf[(h - 1 - r) * w + c];
                buf[(h - 1 - r) * w + c] = t;
            }
    for (int c = 0; c < w; ++c) {
        for (int r = 0; r < h; ++r)
            col[r] = round_shift(buf[r * w + c], p->fs0);
        run_1d(&p->fcol, p->sinpi, col, 0, 0);
        for (int r = 0; r < h; ++r)
            tbuf[r * w + c] = round_shift(col[r], p->fs1);
    }
    if (p->fwd_flip_h)
        for (int r = 0; r < h; ++r)
            for (int c = 0; c < w / 2; ++c) {
                int32_t t = tbuf[r * w + c];
                tbuf[r * w + c] = tbuf[r * w + (w - 1 - c)];
                tbuf[r * w + (w - 1 - c)] = t;
            }
    for (int r = 0; r < h; ++r) {
        run_1d(&p->frow, p->sinpi, tbuf + r * w, 0, 0);
        for (int c = 0; c < w; ++c) {
            int32_t v = round_shift(tbuf[r * w + c], p->fs2);
            if (p->rect) v = mul_sqrt2_round(v, NEW_SQRT2);
            tbuf[r * w + c] = v;
        }
    }

    /* ---- quantize_b + dequant ---- */
    int ls = p->log_scale;
    for (int i = 0; i < h * w; ++i) {
        int dc = (i == 0);
        int32_t cv = tbuf[i];
        int32_t sign = cv < 0 ? -1 : 1;
        int32_t ac = cv < 0 ? -cv : cv;
        if (ac >= p->zbin[!dc ? 1 : 0]) {
            int32_t tmp = ac + p->rnd[dc ? 0 : 1];
            if (tmp > 32767) tmp = 32767;
            if (tmp < -32768) tmp = -32768;
            int64_t t1 = ((int64_t)tmp * p->quant[dc ? 0 : 1]) >> 16;
            int32_t tmp32 = (int32_t)((((int32_t)t1 + tmp)
                                       * (int64_t)p->qshift[dc ? 0 : 1])
                                      >> (16 - ls));
            qc_out[i] = sign * tmp32;
            dq[i] = sign * ((tmp32 * p->dequant[dc ? 0 : 1]) >> ls);
        } else {
            qc_out[i] = 0;
            dq[i] = 0;
        }
    }

    /* ---- eob over the scan of the cw x ch region ---- */
    int eob = 0;
    for (int k = 0; k < p->n_scan; ++k) {
        int pos = p->scan[k];
        int rr = pos / p->cw, cc = pos % p->cw;
        if (qc_out[rr * w + cc]) eob = k + 1;
    }
    if (eob == 0)
        for (int i = 0; i < h * w; ++i) dq[i] = 0;

    /* ---- inverse + recon ---- */
    int bd = p->bd;
    for (int i = 0; i < h * w; ++i) {
        int32_t v = dq[i];
        if (p->rect) v = mul_sqrt2_round(v, NEW_INV_SQRT2);
        int cb = bd + 8;
        buf[i] = clampi(v, -(1 << (cb - 1)), (1 << (cb - 1)) - 1);
    }
    for (int r = 0; r < h; ++r) {
        run_1d(&p->irow, p->sinpi_inv, buf + r * w, p->inv_clamp_row, 1);
        for (int c = 0; c < w; ++c)
            buf[r * w + c] = round_shift(buf[r * w + c], p->is0);
    }
    if (p->fwd_flip_h)    /* FLIPADST row: flip output columns */
        for (int r = 0; r < h; ++r)
            for (int c = 0; c < w / 2; ++c) {
                int32_t t = buf[r * w + c];
                buf[r * w + c] = buf[r * w + (w - 1 - c)];
                buf[r * w + (w - 1 - c)] = t;
            }
    int ccb = bd + 6 > 16 ? bd + 6 : 16;
    for (int c = 0; c < w; ++c) {
        for (int r = 0; r < h; ++r)
            col[r] = clampi(buf[r * w + c], -(1 << (ccb - 1)),
                            (1 << (ccb - 1)) - 1);
        run_1d(&p->icol, p->sinpi_inv, col, p->inv_clamp_col, 1);
        for (int r = 0; r < h; ++r)
            tbuf[r * w + c] = round_shift(col[r], p->is1);
    }
    if (p->fwd_flip_v)
        for (int r = 0; r < h / 2; ++r)
            for (int c = 0; c < w; ++c) {
                int32_t t = tbuf[r * w + c];
                tbuf[r * w + c] = tbuf[(h - 1 - r) * w + c];
                tbuf[(h - 1 - r) * w + c] = t;
            }
    int32_t int_max = ((1 << (7 + bd)) - 1) + (914 << (bd - 7));
    int32_t pmax = (1 << bd) - 1;
    for (int i = 0; i < h * w; ++i) {
        int32_t v = clampi(tbuf[i], -int_max - 1, int_max);
        rec_out[i] = clampi(pred[i] + v, 0, pmax);
    }

    PyBuffer_Release(&rv); PyBuffer_Release(&pv);
    PyBuffer_Release(&qv); PyBuffer_Release(&ov);
    return PyLong_FromLong(eob);
fail:
    PyBuffer_Release(&rv); PyBuffer_Release(&pv);
    PyBuffer_Release(&qv); PyBuffer_Release(&ov);
    return NULL;
}

static PyMethodDef methods[] = {
    {"make_plan", make_plan, METH_VARARGS, NULL},
    {"code_block", code_block, METH_VARARGS, NULL},
    {NULL, NULL, 0, NULL},
};

static PyModuleDef mod = {
    PyModuleDef_HEAD_INIT, "block_native",
    "Fused transform/quant/recon block kernel", -1, methods,
};

PyMODINIT_FUNC PyInit_block_native(void) { return PyModule_Create(&mod); }
