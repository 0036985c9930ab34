"""Generate GIF conformance fixtures from giflib.

Compiles a small C harness against the system giflib runtime (shared
object only — the handful of encoder entry points used are declared
inline; they take opaque pointers plus a packed 3-byte RGB palette
array, so no private struct layout is assumed) and runs it once to
write, per case, under tests/data/gifconf/:

- case<N>.gif — written by giflib's real LZW encoder: 8-bit and
  2-bit palettes, interlaced and sequential row order, and a 2-frame
  full-canvas animation with graphic-control extensions;
- case<N>.ref — the exact pixel indices and palette the harness
  encoded (u16 W, u16 H, u16 n_frames, u16 palette_size, palette
  RGB bytes, then per frame W*H index bytes), so the expected RGB is
  known without trusting any decoder.

GIF is lossless: the pure-Python decoder must reproduce every frame
exactly. Fixtures are committed; re-run only to regenerate. Content
is a deterministic LCG pattern — no external data.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

C_SOURCE = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* minimal public giflib 5.x encoder API (headers not installed) */
typedef unsigned char GifByteType;
typedef struct { GifByteType Red, Green, Blue; } GifColorType;
typedef struct ColorMapObject ColorMapObject;
typedef struct GifFileType GifFileType;
extern GifFileType *EGifOpenFileName(const char *, int, int *);
extern int EGifPutScreenDesc(GifFileType *, int, int, int, int,
                             const ColorMapObject *);
extern int EGifPutImageDesc(GifFileType *, int, int, int, int, int,
                            const ColorMapObject *);
extern int EGifPutLine(GifFileType *, GifByteType *, int);
extern int EGifPutExtension(GifFileType *, int, int, const void *);
extern int EGifCloseFile(GifFileType *, int *);
extern ColorMapObject *GifMakeMapObject(int, const GifColorType *);
extern void GifFreeMapObject(ColorMapObject *);

static unsigned int lcg_state = 31337u;
static unsigned int lcg(void) {
    lcg_state = lcg_state * 1103515245u + 12345u;
    return (lcg_state >> 16) & 0xFFFF;
}

static void put16(FILE *f, unsigned v) {
    fputc(v & 0xFF, f); fputc((v >> 8) & 0xFF, f);
}

/* the interlaced row order a GIF87a/89a decoder must untangle */
static int interlace_rows(int h, int *order) {
    int n = 0;
    for (int y = 0; y < h; y += 8) order[n++] = y;
    for (int y = 4; y < h; y += 8) order[n++] = y;
    for (int y = 2; y < h; y += 4) order[n++] = y;
    for (int y = 1; y < h; y += 2) order[n++] = y;
    return n;
}

static void write_case(const char *gif_path, const char *ref_path,
                       int w, int h, int pal_bits, int interlace,
                       int frames) {
    int pal_n = 1 << pal_bits;
    GifColorType *pal = malloc(sizeof(GifColorType) * pal_n);
    for (int i = 0; i < pal_n; i++) {
        pal[i].Red = (GifByteType)lcg();
        pal[i].Green = (GifByteType)lcg();
        pal[i].Blue = (GifByteType)lcg();
    }
    GifByteType *idx = malloc((size_t)w * h * frames);
    for (int i = 0; i < w * h * frames; i++)
        idx[i] = (GifByteType)(lcg() % pal_n);

    int err = 0;
    GifFileType *g = EGifOpenFileName(gif_path, 0, &err);
    ColorMapObject *cmap = GifMakeMapObject(pal_n, pal);
    EGifPutScreenDesc(g, w, h, pal_bits, 0, cmap);
    for (int fi = 0; fi < frames; fi++) {
        if (frames > 1) {
            /* graphic-control: disposal 1 (keep), 10 cs delay */
            unsigned char gce[4] = {1 << 2, 10, 0, 0};
            EGifPutExtension(g, 0xF9, 4, gce);
        }
        EGifPutImageDesc(g, 0, 0, w, h, interlace, NULL);
        GifByteType *base = idx + (size_t)fi * w * h;
        if (interlace) {
            int *order = malloc(sizeof(int) * h);
            int n = interlace_rows(h, order);
            for (int k = 0; k < n; k++)
                EGifPutLine(g, base + (size_t)order[k] * w, w);
            free(order);
        } else {
            for (int y = 0; y < h; y++)
                EGifPutLine(g, base + (size_t)y * w, w);
        }
    }
    EGifCloseFile(g, &err);
    GifFreeMapObject(cmap);

    FILE *f = fopen(ref_path, "wb");
    put16(f, w); put16(f, h); put16(f, frames); put16(f, pal_n);
    for (int i = 0; i < pal_n; i++) {
        fputc(pal[i].Red, f); fputc(pal[i].Green, f);
        fputc(pal[i].Blue, f);
    }
    fwrite(idx, 1, (size_t)w * h * frames, f);
    fclose(f);
    free(pal);
    free(idx);
}

int main(int argc, char **argv) {
    const char *dir = argv[1];
    char gp[512], rp[512];
    struct { int w, h, bits, inter, frames; } cases[] = {
        {37, 23, 8, 0, 1},    /* 256-color sequential      */
        {29, 31, 8, 1, 1},    /* 256-color interlaced      */
        {24, 17, 2, 0, 1},    /* 4-color small code width  */
        {19, 13, 4, 1, 1},    /* 16-color interlaced, odd  */
        {16, 12, 8, 0, 2},    /* 2-frame animation + GCE   */
    };
    int n = (int)(sizeof(cases) / sizeof(cases[0]));
    for (int i = 0; i < n; i++) {
        snprintf(gp, sizeof gp, "%s/case%d.gif", dir, i);
        snprintf(rp, sizeof rp, "%s/case%d.ref", dir, i);
        write_case(gp, rp, cases[i].w, cases[i].h, cases[i].bits,
                   cases[i].inter, cases[i].frames);
    }
    printf("%d cases written to %s\n", n, dir);
    return 0;
}
"""


def main() -> None:
    out_dir = pathlib.Path(__file__).resolve().parents[1] \
        / "tests" / "data" / "gifconf"
    out_dir.mkdir(parents=True, exist_ok=True)
    src = pathlib.Path("/tmp/make_gif_fixtures.c")
    src.write_text(C_SOURCE)
    exe = "/tmp/make_gif_fixtures"
    subprocess.run(
        ["gcc", "-O2", "-o", exe, str(src),
         "/usr/lib/x86_64-linux-gnu/libgif.so.7"], check=True)
    subprocess.run([exe, str(out_dir)], check=True)


if __name__ == "__main__":
    sys.exit(main())
