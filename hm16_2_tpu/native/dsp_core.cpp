// Native DSP hot loops for the encoder's per-TU coding path.
//
// Fused transform -> quant -> dequant -> inverse-transform -> reconstruct,
// exactly mirroring hm16_2_tpu/ops/transforms_ref.py (which itself mirrors
// the normative spec 8.6.3-8.6.5 semantics: 6-bit matrices, HM shift
// schedule, flat scaling lists, 171/512 intra / 85/512 inter rounding).
//
// Built with g++ -O3 -shared -fPIC by hm16_2_tpu.native.

#include <cstdint>
#include <cstring>

static const int32_t *g_dct[6] = {0, 0, 0, 0, 0, 0};  // index log2: 2..5
static const int32_t *g_dst4 = 0;
static int32_t g_qscale[6];
static int32_t g_iqscale[6];

extern "C" void set_dsp_tables(const void *d4, const void *d8,
                               const void *d16, const void *d32,
                               const void *dst4, const void *qs,
                               const void *iqs) {
  g_dct[2] = (const int32_t *)d4;
  g_dct[3] = (const int32_t *)d8;
  g_dct[4] = (const int32_t *)d16;
  g_dct[5] = (const int32_t *)d32;
  g_dst4 = (const int32_t *)dst4;
  memcpy(g_qscale, qs, 6 * sizeof(int32_t));
  memcpy(g_iqscale, iqs, 6 * sizeof(int32_t));
}

static inline int64_t clip64(int64_t v, int64_t lo, int64_t hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// out[i][j] = sum_k a[i][k] * bT[j][k]   (b transposed), n x n
static void matmul_abt(const int64_t *a, const int32_t *b, int n,
                       int64_t *out) {
  for (int i = 0; i < n; i++)
    for (int j = 0; j < n; j++) {
      int64_t acc = 0;
      const int64_t *ar = a + i * n;
      const int32_t *br = b + j * n;
      for (int k = 0; k < n; k++) acc += ar[k] * (int64_t)br[k];
      out[i * n + j] = acc;
    }
}

// out[i][j] = sum_k t[i][k] * a[k][j]
static void matmul_ta(const int32_t *t, const int64_t *a, int n,
                      int64_t *out) {
  for (int i = 0; i < n; i++)
    for (int j = 0; j < n; j++) {
      int64_t acc = 0;
      for (int k = 0; k < n; k++)
        acc += (int64_t)t[i * n + k] * a[k * n + j];
      out[i * n + j] = acc;
    }
}

// out[i][j] = sum_k tT[k][i] * a[k][j]  (t transposed on the left)
static void matmul_tta(const int32_t *t, const int64_t *a, int n,
                       int64_t *out) {
  for (int i = 0; i < n; i++)
    for (int j = 0; j < n; j++) {
      int64_t acc = 0;
      for (int k = 0; k < n; k++)
        acc += (int64_t)t[k * n + i] * a[k * n + j];
      out[i * n + j] = acc;
    }
}

// out[i][j] = sum_k a[i][k] * t[k][j]
static void matmul_at(const int64_t *a, const int32_t *t, int n,
                      int64_t *out) {
  for (int i = 0; i < n; i++)
    for (int j = 0; j < n; j++) {
      int64_t acc = 0;
      const int64_t *ar = a + i * n;
      for (int k = 0; k < n; k++) acc += ar[k] * (int64_t)t[k * n + j];
      out[i * n + j] = acc;
    }
}

// Fused TU coding.  orig/pred: n*n int32 row-major with given strides
// (elements).  Writes quantized levels (n*n int32, stride lvl_stride) and
// reconstruction (stride rec_stride).  Returns cbf (0/1), or -1 on error.
extern "C" int code_tu(const int32_t *orig, int64_t orig_stride,
                       const int32_t *pred, int64_t pred_stride, int n,
                       int log2n, int bit_depth, int qp, int use_dst,
                       int is_intra, int32_t *levels, int64_t lvl_stride,
                       int32_t *rec, int64_t rec_stride) {
  if (log2n < 2 || log2n > 5) return -1;
  const int32_t *t = (use_dst && n == 4) ? g_dst4 : g_dct[log2n];
  if (!t) return -1;
  int64_t buf_r[32 * 32], buf_1[32 * 32], buf_2[32 * 32];

  // residual
  for (int i = 0; i < n; i++)
    for (int j = 0; j < n; j++)
      buf_r[i * n + j] =
          (int64_t)orig[i * orig_stride + j] - pred[i * pred_stride + j];

  // forward: stage1 horizontal r @ T^T, shift s1; stage2 vertical T @ ., s2
  int s1 = log2n - 1 + bit_depth - 8;
  int s2 = log2n + 6;
  matmul_abt(buf_r, t, n, buf_1);
  if (s1 > 0) {
    int64_t add = (int64_t)1 << (s1 - 1);
    for (int i = 0; i < n * n; i++) buf_1[i] = (buf_1[i] + add) >> s1;
  } else if (s1 < 0) {
    for (int i = 0; i < n * n; i++) buf_1[i] <<= -s1;
  }
  matmul_ta(t, buf_1, n, buf_2);
  {
    int64_t add = (int64_t)1 << (s2 - 1);
    for (int i = 0; i < n * n; i++) buf_2[i] = (buf_2[i] + add) >> s2;
  }

  // quant (flat): q_bits = 14 + per + tshift
  int per = qp / 6, rem = qp % 6;
  int tshift = 15 - bit_depth - log2n;
  int q_bits = 14 + per + tshift;
  int64_t scale = g_qscale[rem];
  int64_t qadd = (int64_t)(is_intra ? 171 : 85) << (q_bits - 9);
  int cbf = 0;
  for (int i = 0; i < n; i++)
    for (int j = 0; j < n; j++) {
      int64_t c = buf_2[i * n + j];
      int64_t mag = (c < 0 ? -c : c);
      int64_t lvl = (mag * scale + qadd) >> q_bits;
      lvl = clip64(lvl, 0, 32767);
      if (c < 0) lvl = -lvl;
      levels[i * lvl_stride + j] = (int32_t)lvl;
      buf_r[i * n + j] = lvl;  // reuse as dequant input
      if (lvl) cbf = 1;
    }

  int64_t maxv = ((int64_t)1 << bit_depth) - 1;
  if (!cbf) {
    for (int i = 0; i < n; i++)
      for (int j = 0; j < n; j++) {
        int64_t v = pred[i * pred_stride + j];
        rec[i * rec_stride + j] = (int32_t)clip64(v, 0, maxv);
      }
    return 0;
  }

  // dequant (flat): right_shift = 6 - (tshift + per)
  {
    int right_shift = 6 - (tshift + per);
    int64_t iscale = g_iqscale[rem];
    int target_bd = 16 < (64 + right_shift - 7) ? 16 : (64 + right_shift - 7);
    int64_t imin = -((int64_t)1 << (target_bd - 1));
    int64_t imax = ((int64_t)1 << (target_bd - 1)) - 1;
    for (int i = 0; i < n * n; i++) {
      int64_t cq = clip64(buf_r[i], imin, imax);
      int64_t out;
      if (right_shift > 0)
        out = (cq * iscale + ((int64_t)1 << (right_shift - 1))) >> right_shift;
      else
        out = (cq * iscale) << (-right_shift);
      buf_r[i] = clip64(out, -32768, 32767);
    }
  }

  // inverse: stage1 vertical T^T(left) with clip to dynamic range, stage2
  // horizontal @ T with int16 clip
  {
    int is1 = 6 + 1;
    int is2 = (6 + 15 - 1) - bit_depth;
    matmul_tta(t, buf_r, n, buf_1);
    int64_t add1 = (int64_t)1 << (is1 - 1);
    for (int i = 0; i < n * n; i++)
      buf_1[i] = clip64((buf_1[i] + add1) >> is1, -32768, 32767);
    matmul_at(buf_1, t, n, buf_2);
    int64_t add2 = (int64_t)1 << (is2 - 1);
    for (int i = 0; i < n; i++)
      for (int j = 0; j < n; j++) {
        int64_t res =
            clip64((buf_2[i * n + j] + add2) >> is2, -32768, 32767);
        int64_t v = pred[i * pred_stride + j] + res;
        rec[i * rec_stride + j] = (int32_t)clip64(v, 0, maxv);
      }
  }
  return 1;
}
