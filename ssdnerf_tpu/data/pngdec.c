/* GIL-free batched PNG decoding for the data loader.
 *
 * The reference streams its 400-image batches through torch DataLoader
 * worker *processes* (lib/datasets/builder.py:14-64) because CPython
 * decoding threads serialize on the GIL.  Here the whole batch decode is
 * one ctypes foreign call (ctypes drops the GIL for the call's duration),
 * and an internal pthread pool decodes images concurrently with libpng —
 * no worker processes, no pickling round-trip, linear thread scaling.
 *
 * Output matches cv2.imread(IMREAD_COLOR)[..., ::-1]: 8-bit RGB rows,
 * palette/gray expanded, 16-bit narrowed, alpha stripped.
 *
 * Built on demand by ssdnerf_tpu/data/native_png.py:
 *   cc -O2 -shared -fPIC pngdec.c -lpng -lz -lpthread -o <cache>/.so
 */
#include <png.h>
#include <pthread.h>
#include <setjmp.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* Read just the IHDR dims (needs only the first 26 bytes). */
int png_batch_dims(const char *path, int *h, int *w) {
    unsigned char buf[26];
    FILE *fp = fopen(path, "rb");
    if (!fp) return 1;
    size_t got = fread(buf, 1, sizeof(buf), fp);
    fclose(fp);
    if (got != sizeof(buf)) return 2;
    static const unsigned char sig[8] =
        {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
    if (memcmp(buf, sig, 8) != 0 || memcmp(buf + 12, "IHDR", 4) != 0)
        return 3;
    *w = (buf[16] << 24) | (buf[17] << 16) | (buf[18] << 8) | buf[19];
    *h = (buf[20] << 24) | (buf[21] << 16) | (buf[22] << 8) | buf[23];
    return 0;
}

static int decode_one(const char *path, unsigned char *dst, int h, int w) {
    FILE *fp = fopen(path, "rb");
    if (!fp) return 1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             NULL, NULL, NULL);
    if (!png) { fclose(fp); return 2; }
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, NULL, NULL);
        fclose(fp);
        return 2;
    }
    if (setjmp(png_jmpbuf(png))) {  /* libpng error -> longjmp here */
        png_destroy_read_struct(&png, &info, NULL);
        fclose(fp);
        return 3;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    if ((int)png_get_image_width(png, info) != w ||
        (int)png_get_image_height(png, info) != h) {
        png_destroy_read_struct(&png, &info, NULL);
        fclose(fp);
        return 4;
    }
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    if (depth == 16)
        png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE)
        png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS))
        png_set_tRNS_to_alpha(png);
    /* cv2.imread(IMREAD_COLOR) drops alpha without compositing; match it */
    png_set_strip_alpha(png);
    int passes = png_set_interlace_handling(png);
    png_read_update_info(png, info);
    if (png_get_rowbytes(png, info) != (size_t)w * 3) {
        png_destroy_read_struct(&png, &info, NULL);
        fclose(fp);
        return 5;
    }
    for (int p = 0; p < passes; p++)
        for (int y = 0; y < h; y++)
            png_read_row(png, dst + (size_t)y * w * 3, NULL);
    png_read_end(png, NULL);
    png_destroy_read_struct(&png, &info, NULL);
    fclose(fp);
    return 0;
}

typedef struct {
    const char **paths;
    unsigned char *out;
    int n, h, w;
    int next;
    int err; /* 1-based index of first failed image, 0 = ok */
    pthread_mutex_t lock;
} job_t;

static void *worker(void *arg) {
    job_t *j = (job_t *)arg;
    for (;;) {
        pthread_mutex_lock(&j->lock);
        int i = j->next++;
        pthread_mutex_unlock(&j->lock);
        if (i >= j->n)
            return NULL;
        int rc = decode_one(j->paths[i],
                            j->out + (size_t)i * j->h * j->w * 3,
                            j->h, j->w);
        if (rc) {
            pthread_mutex_lock(&j->lock);
            if (!j->err)
                j->err = i + 1;
            pthread_mutex_unlock(&j->lock);
        }
    }
}

/* Decode n same-sized PNGs into out[n, h, w, 3] u8. Returns 0 on success,
 * else the 1-based index of the first image that failed or mismatched. */
int png_batch_decode(const char **paths, int n, unsigned char *out,
                     int h, int w, int nthreads) {
    job_t j;
    j.paths = paths;
    j.out = out;
    j.n = n;
    j.h = h;
    j.w = w;
    j.next = 0;
    j.err = 0;
    pthread_mutex_init(&j.lock, NULL);
    if (nthreads < 1)
        nthreads = 1;
    if (nthreads > n)
        nthreads = n;
    if (nthreads > 64)
        nthreads = 64;
    pthread_t tids[64];
    int started = 0;
    for (int t = 0; t < nthreads; t++) {
        if (pthread_create(&tids[t], NULL, worker, &j) != 0)
            break;
        started++;
    }
    if (started == 0)
        worker(&j); /* degrade to inline decoding */
    for (int t = 0; t < started; t++)
        pthread_join(tids[t], NULL);
    pthread_mutex_destroy(&j.lock);
    return j.err;
}
