/* Native COCO RLE + polygon rasterization kernels for the episode-assembly
 * hot loop (the role pycocotools' C backend plays for the reference,
 * reference: label_anything/data/transforms.py:76-149).
 *
 * Compiled on demand with the system C compiler and loaded via ctypes
 * (labelanything_tpu/data/native.py); the pure-NumPy implementation in
 * data/rle.py remains the behavioural contract and fallback.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* Decode a COCO compressed-RLE counts string into a row-major H x W mask.
 * Returns 0 on success, -1 if the run lengths do not cover h*w exactly. */
int rle_decode(const char *counts, long n_counts_chars, long h, long w,
               uint8_t *out /* h*w, row-major */) {
    long pos = 0, p = 0;
    long total = 0;
    long hw = h * w;
    uint8_t value = 0;
    /* first pass: decode LEB-ish varints with delta, fill column-major runs */
    long prev2 = 0, prev1 = 0; /* cnts[p-2], cnts[p-1] */
    long col = 0, row = 0;
    while (pos < n_counts_chars && counts[pos]) {
        long x = 0;
        int k = 0, more = 1;
        while (more) {
            long c = (long)(counts[pos]) - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (int)(c & 0x20);
            pos++;
            k++;
            if (!more && (c & 0x10))
                x |= -1L << (5 * k);
            if (pos > n_counts_chars)
                return -1;
        }
        if (p > 2)
            x += prev2;
        prev2 = prev1;
        prev1 = x;
        p++;
        if (x < 0 || total + x > hw)
            return -1;
        /* write run of `value` at column-major positions [total, total+x) */
        for (long i = 0; i < x; i++) {
            long idx = total + i;          /* column-major index */
            long r = idx % h, cidx = idx / h;
            out[r * w + cidx] = value;
        }
        total += x;
        value = 1 - value;
        (void)col;
        (void)row;
    }
    return total == hw ? 0 : -1;
}

/* Scanline polygon fill (even-odd rule with half-open pixel centers),
 * OR-ing into `out` (row-major h*w). Matches PIL's polygon fill closely. */
void poly_fill(const double *xy, long n_pts, long h, long w, uint8_t *out) {
    if (n_pts < 3)
        return;
    double *xs = (double *)malloc(sizeof(double) * (size_t)n_pts);
    if (!xs)
        return;
    for (long y = 0; y < h; y++) {
        double fy = (double)y + 0.0; /* PIL samples at integer y */
        long n_x = 0;
        for (long i = 0; i < n_pts; i++) {
            long j = (i + 1) % n_pts;
            double y0 = xy[2 * i + 1], y1 = xy[2 * j + 1];
            double x0 = xy[2 * i], x1 = xy[2 * j];
            if ((y0 <= fy && y1 > fy) || (y1 <= fy && y0 > fy)) {
                double t = (fy - y0) / (y1 - y0);
                xs[n_x++] = x0 + t * (x1 - x0);
            }
        }
        /* insertion sort of crossings */
        for (long i = 1; i < n_x; i++) {
            double v = xs[i];
            long j = i - 1;
            while (j >= 0 && xs[j] > v) {
                xs[j + 1] = xs[j];
                j--;
            }
            xs[j + 1] = v;
        }
        for (long i = 0; i + 1 < n_x; i += 2) {
            long xa = (long)(xs[i] + 0.5);
            long xb = (long)(xs[i + 1] + 0.5);
            if (xa < 0)
                xa = 0;
            if (xb > w)
                xb = w;
            for (long x = xa; x < xb; x++)
                out[y * w + x] = 1;
        }
    }
    /* draw the outline too (PIL fills outline pixels) */
    for (long i = 0; i < n_pts; i++) {
        long j = (i + 1) % n_pts;
        double x0 = xy[2 * i], y0 = xy[2 * i + 1];
        double x1 = xy[2 * j], y1 = xy[2 * j + 1];
        double dx = x1 - x0, dy = y1 - y0;
        long steps = (long)((dx < 0 ? -dx : dx) > (dy < 0 ? -dy : dy)
                                ? (dx < 0 ? -dx : dx)
                                : (dy < 0 ? -dy : dy)) + 1;
        for (long s = 0; s <= steps; s++) {
            double t = (double)s / (double)steps;
            long px = (long)(x0 + t * dx + 0.5);
            long py = (long)(y0 + t * dy + 0.5);
            if (px >= 0 && px < w && py >= 0 && py < h)
                out[py * w + px] = 1;
        }
    }
    free(xs);
}

/* Batch OR-reduce + 2x2-mean-threshold downsample helper used by
 * PromptsProcessor.apply_masks: OR n masks (h*w each), then nearest-resize is
 * done in Python. Provided for the hot multi-instance case. */
void or_reduce(const uint8_t *masks, long n, long hw, uint8_t *out) {
    memset(out, 0, (size_t)hw);
    for (long i = 0; i < n; i++) {
        const uint8_t *m = masks + i * hw;
        for (long j = 0; j < hw; j++)
            out[j] |= m[j];
    }
}

/* Ground-truth label write: out[j] = value wherever mask[j] != 0.
 * One branch-free pass replaces numpy's `gt[mask == 1] = value`
 * (bool-temporary alloc + fancy-index scatter) in the per-annotation
 * GT rasterization loop (data/coco.py compute_ground_truths*). */
void label_fill(const uint8_t *mask, long hw, int32_t value, int32_t *out) {
    for (long j = 0; j < hw; j++)
        out[j] = mask[j] ? value : out[j];
}
