"""Generate JPEG-in-TIFF (compression 7) conformance fixtures.

Compiles a small C harness against the system libtiff runtime (the
shared object is present in this container; its headers are not, so
the handful of public API entry points used are declared inline — the
tag constants are the public TIFF 6.0 / TechNote 2 values) and runs it
once to write, per case, under tests/data/jpegtiff/:

- case<N>.tif — a compression-7 TIFF written by libtiff (abbreviated
  JPEG streams + JPEGTables tag; strip and tile variants),
- case<N>.rgb — libtiff's own TIFFReadRGBAImageOriented decode as the
  reference (u16 W, u16 H, then W*H*3 bytes).

Fixtures are committed; re-run only to regenerate. Image content is a
deterministic LCG pattern — no external data. Note the chroma caveat:
libtiff's read path uses libjpeg's default "fancy" (triangular)
chroma upsampling, while this repo's decoder uses pixel replication,
so the subsampled case is compared with a loose tolerance and the
1x1-sampled cases strictly (see tests/test_tiff.py).
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

C_SOURCE = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* minimal public libtiff API surface (headers not installed) */
typedef struct tiff TIFF;
extern TIFF *TIFFOpen(const char *, const char *);
extern int TIFFSetField(TIFF *, unsigned int, ...);
extern int TIFFWriteScanline(TIFF *, void *, unsigned int,
                             unsigned short);
extern long TIFFWriteTile(TIFF *, void *, unsigned int, unsigned int,
                          unsigned int, unsigned short);
extern void TIFFClose(TIFF *);
extern int TIFFGetField(TIFF *, unsigned int, ...);
extern int TIFFReadRGBAImageOriented(TIFF *, unsigned int,
                                     unsigned int, unsigned int *,
                                     int, int);

#define TAG_WIDTH 256
#define TAG_LENGTH 257
#define TAG_BPS 258
#define TAG_COMPRESSION 259
#define TAG_PHOTOMETRIC 262
#define TAG_SPP 277
#define TAG_ROWSPERSTRIP 278
#define TAG_PLANARCONFIG 284
#define TAG_TILEWIDTH 322
#define TAG_TILELENGTH 323
#define TAG_YCBCRSUBSAMPLING 530
#define TAG_JPEGQUALITY 65537   /* libtiff pseudo-tag */
#define TAG_JPEGCOLORMODE 65538 /* libtiff pseudo-tag; 1 = RGB */
#define COMP_JPEG 7
#define PHOTO_MINISBLACK 1
#define PHOTO_YCBCR 6
#define ORIENT_TOPLEFT 1

static unsigned int lcg_state = 777u;
static unsigned int lcg(void) {
    lcg_state = lcg_state * 1103515245u + 12345u;
    return (lcg_state >> 16) & 0xFF;
}

static unsigned char *make_image(int w, int h, int comps) {
    unsigned char *img = malloc((size_t)w * h * comps);
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
            for (int c = 0; c < comps; c++)
                img[(y * w + x) * comps + c] = (unsigned char)
                    ((x * 5 + y * 11 + c * 37 + (int)lcg() / 4)
                     & 0xFF);
    return img;
}

static void put16(FILE *f, unsigned v) {
    fputc(v & 0xFF, f); fputc((v >> 8) & 0xFF, f);
}

static void write_case(const char *path, int w, int h, int gray,
                       int subsamp, int tiled, int quality) {
    int comps = gray ? 1 : 3;
    unsigned char *img = make_image(w, h, comps);
    TIFF *t = TIFFOpen(path, "w");
    TIFFSetField(t, TAG_WIDTH, w);
    TIFFSetField(t, TAG_LENGTH, h);
    TIFFSetField(t, TAG_BPS, 8);
    TIFFSetField(t, TAG_SPP, comps);
    TIFFSetField(t, TAG_PLANARCONFIG, 1);
    TIFFSetField(t, TAG_COMPRESSION, COMP_JPEG);
    TIFFSetField(t, TAG_PHOTOMETRIC,
                 gray ? PHOTO_MINISBLACK : PHOTO_YCBCR);
    if (!gray) {
        TIFFSetField(t, TAG_JPEGCOLORMODE, 1);  /* RGB in, YCbCr out */
        TIFFSetField(t, TAG_YCBCRSUBSAMPLING, subsamp, subsamp);
    }
    TIFFSetField(t, TAG_JPEGQUALITY, quality);
    if (tiled) {
        TIFFSetField(t, TAG_TILEWIDTH, 16);
        TIFFSetField(t, TAG_TILELENGTH, 16);
        unsigned char *tile = malloc((size_t)16 * 16 * comps);
        for (int ty = 0; ty < h; ty += 16)
            for (int tx = 0; tx < w; tx += 16) {
                memset(tile, 0, (size_t)16 * 16 * comps);
                for (int y = 0; y < 16 && ty + y < h; y++)
                    for (int x = 0; x < 16 && tx + x < w; x++)
                        memcpy(tile + (y * 16 + x) * comps,
                               img + ((size_t)(ty + y) * w + tx + x)
                                   * comps, comps);
                TIFFWriteTile(t, tile, tx, ty, 0, 0);
            }
        free(tile);
    } else {
        TIFFSetField(t, TAG_ROWSPERSTRIP, 16);
        for (int y = 0; y < h; y++)
            TIFFWriteScanline(t, img + (size_t)y * w * comps, y, 0);
    }
    TIFFClose(t);
    free(img);
}

static void dump_rgb(const char *tif_path, const char *out) {
    TIFF *t = TIFFOpen(tif_path, "r");
    unsigned int w = 0, h = 0;
    TIFFGetField(t, TAG_WIDTH, &w);
    TIFFGetField(t, TAG_LENGTH, &h);
    unsigned int *raster = malloc((size_t)w * h * 4);
    TIFFReadRGBAImageOriented(t, w, h, raster, ORIENT_TOPLEFT, 0);
    FILE *f = fopen(out, "wb");
    put16(f, w); put16(f, h);
    for (size_t i = 0; i < (size_t)w * h; i++) {
        unsigned int px = raster[i];          /* ABGR packed */
        fputc(px & 0xFF, f);
        fputc((px >> 8) & 0xFF, f);
        fputc((px >> 16) & 0xFF, f);
    }
    fclose(f);
    free(raster);
    TIFFClose(t);
}

int main(int argc, char **argv) {
    const char *dir = argv[1];
    char tif[512], rgb[512];
    struct { int w, h, gray, subsamp, tiled, q; } cases[] = {
        {40, 25, 1, 1, 0, 85},   /* gray strips                   */
        {33, 22, 0, 1, 0, 90},   /* color 1x1 strips              */
        {48, 31, 0, 2, 0, 75},   /* color 2x2 strips (loose cmp)  */
        {37, 29, 0, 1, 1, 80},   /* color 1x1 tiled, partial edge */
    };
    int n = (int)(sizeof(cases) / sizeof(cases[0]));
    for (int i = 0; i < n; i++) {
        snprintf(tif, sizeof tif, "%s/case%d.tif", dir, i);
        snprintf(rgb, sizeof rgb, "%s/case%d.rgb", dir, i);
        write_case(tif, cases[i].w, cases[i].h, cases[i].gray,
                   cases[i].subsamp, cases[i].tiled, cases[i].q);
        dump_rgb(tif, rgb);
    }
    printf("%d cases written to %s\n", n, dir);
    return 0;
}
"""


def main() -> None:
    out_dir = pathlib.Path(__file__).resolve().parents[1] \
        / "tests" / "data" / "jpegtiff"
    out_dir.mkdir(parents=True, exist_ok=True)
    src = pathlib.Path("/tmp/make_jpegtiff_fixtures.c")
    src.write_text(C_SOURCE)
    exe = "/tmp/make_jpegtiff_fixtures"
    subprocess.run(
        ["gcc", "-O2", "-o", exe, str(src),
         "/usr/lib/x86_64-linux-gnu/libtiff.so.6"], check=True)
    subprocess.run([exe, str(out_dir)], check=True)


if __name__ == "__main__":
    sys.exit(main())
