"""Generate PNG conformance fixtures from libpng.

Compiles a small C harness against the system libpng (headers present
in this container) and runs it once to write, per case, under
tests/data/pngconf/:

- case<N>.png — written by libpng with PNG_ALL_FILTERS (so real
  filter heuristics pick Sub/Up/Average/Paeth per row), covering the
  full IHDR matrix: gray 1/2/4/8/16, RGB 8/16, palette 1/2/4/8,
  gray+alpha 8/16, RGBA 8/16, non-interlaced and Adam7, odd sizes;
- case<N>.rgb — libpng's own read-back through the transform chain
  palette→RGB, expand-gray, scale-16 (whose rounding is bit-identical
  to this repo's (v*255+32767)//65535 — verified exhaustively),
  gray→RGB, strip-alpha: an 8-bit RGB reference the pure-Python
  decoder must match EXACTLY (PNG is lossless; no tolerance).

Fixtures are committed; re-run only to regenerate. Content is a
deterministic LCG pattern — no external data.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

C_SOURCE = r"""
#include <png.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static unsigned int lcg_state = 4242u;
static unsigned int lcg(void) {
    lcg_state = lcg_state * 1103515245u + 12345u;
    return (lcg_state >> 16) & 0xFFFF;
}

static void put16(FILE *f, unsigned v) {
    fputc(v & 0xFF, f); fputc((v >> 8) & 0xFF, f);
}

static int channels_of(int ctype) {
    switch (ctype) {
    case PNG_COLOR_TYPE_GRAY: return 1;
    case PNG_COLOR_TYPE_RGB: return 3;
    case PNG_COLOR_TYPE_PALETTE: return 1;
    case PNG_COLOR_TYPE_GRAY_ALPHA: return 2;
    default: return 4;
    }
}

static void write_case(const char *path, int w, int h, int ctype,
                       int depth, int interlace) {
    FILE *f = fopen(path, "wb");
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                              NULL, NULL, NULL);
    png_infop info = png_create_info_struct(png);
    png_init_io(png, f);
    png_set_IHDR(png, info, w, h, depth, ctype, interlace,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
    png_set_filter(png, 0, PNG_ALL_FILTERS);
    png_color pal[256];
    if (ctype == PNG_COLOR_TYPE_PALETTE) {
        int n = 1 << depth;
        for (int i = 0; i < n; i++) {
            pal[i].red = (png_byte)lcg();
            pal[i].green = (png_byte)lcg();
            pal[i].blue = (png_byte)lcg();
        }
        png_set_PLTE(png, info, pal, n);
    }
    png_write_info(png, info);
    int ch = channels_of(ctype);
    int maxv = (depth >= 8) ? ((1 << depth) - 1) : ((1 << depth) - 1);
    png_bytep *rows = malloc(sizeof(png_bytep) * h);
    if (depth < 8)
        png_set_packing(png);        /* we hand one byte per sample */
    for (int y = 0; y < h; y++) {
        if (depth == 16) {
            rows[y] = malloc((size_t)w * ch * 2);
            for (int i = 0; i < w * ch; i++) {
                unsigned v = lcg() & maxv;
                rows[y][2 * i] = (png_byte)(v >> 8);       /* big end */
                rows[y][2 * i + 1] = (png_byte)(v & 0xFF);
            }
        } else {
            rows[y] = malloc((size_t)w * ch);
            for (int i = 0; i < w * ch; i++)
                rows[y][i] = (png_byte)(lcg() & maxv);
        }
    }
    png_write_image(png, rows);
    png_write_end(png, info);
    for (int y = 0; y < h; y++) free(rows[y]);
    free(rows);
    png_destroy_write_struct(&png, &info);
    fclose(f);
}

static void dump_rgb(const char *png_path, const char *out) {
    FILE *f = fopen(png_path, "rb");
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             NULL, NULL, NULL);
    png_infop info = png_create_info_struct(png);
    png_init_io(png, f);
    png_read_info(png, info);
    int ctype = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    if (ctype == PNG_COLOR_TYPE_PALETTE)
        png_set_palette_to_rgb(png);
    if (ctype == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (depth == 16)
        png_set_scale_16(png);   /* same rounding as the repo decoder */
    if (ctype == PNG_COLOR_TYPE_GRAY
        || ctype == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (ctype & PNG_COLOR_MASK_ALPHA)
        png_set_strip_alpha(png);
    png_set_interlace_handling(png);
    png_read_update_info(png, info);
    unsigned w = png_get_image_width(png, info);
    unsigned h = png_get_image_height(png, info);
    png_bytep *rows = malloc(sizeof(png_bytep) * h);
    for (unsigned y = 0; y < h; y++)
        rows[y] = malloc((size_t)w * 3);
    png_read_image(png, rows);
    FILE *o = fopen(out, "wb");
    put16(o, w); put16(o, h);
    for (unsigned y = 0; y < h; y++) {
        fwrite(rows[y], 1, (size_t)w * 3, o);
        free(rows[y]);
    }
    free(rows);
    fclose(o);
    png_destroy_read_struct(&png, &info, NULL);
    fclose(f);
}

int main(int argc, char **argv) {
    const char *dir = argv[1];
    char pngp[512], rgbp[512];
    struct { int ctype, depth, interlace, w, h; } cases[] = {
        {PNG_COLOR_TYPE_GRAY, 1, 0, 21, 13},
        {PNG_COLOR_TYPE_GRAY, 2, 0, 19, 7},
        {PNG_COLOR_TYPE_GRAY, 4, 0, 18, 9},
        {PNG_COLOR_TYPE_GRAY, 8, 0, 33, 17},
        {PNG_COLOR_TYPE_GRAY, 16, 0, 24, 11},
        {PNG_COLOR_TYPE_RGB, 8, 0, 37, 23},
        {PNG_COLOR_TYPE_RGB, 16, 0, 16, 16},
        {PNG_COLOR_TYPE_PALETTE, 1, 0, 23, 9},
        {PNG_COLOR_TYPE_PALETTE, 4, 0, 17, 12},
        {PNG_COLOR_TYPE_PALETTE, 8, 0, 29, 15},
        {PNG_COLOR_TYPE_GRAY_ALPHA, 8, 0, 22, 14},
        {PNG_COLOR_TYPE_GRAY_ALPHA, 16, 0, 13, 19},
        {PNG_COLOR_TYPE_RGB_ALPHA, 8, 0, 26, 10},
        {PNG_COLOR_TYPE_RGB_ALPHA, 16, 0, 15, 21},
        {PNG_COLOR_TYPE_GRAY, 4, 1, 21, 13},
        {PNG_COLOR_TYPE_RGB, 8, 1, 27, 19},
        {PNG_COLOR_TYPE_PALETTE, 2, 1, 18, 11},
        {PNG_COLOR_TYPE_RGB_ALPHA, 16, 1, 17, 9},
        {PNG_COLOR_TYPE_RGB, 8, 0, 257, 129},  /* filter variety     */
        {PNG_COLOR_TYPE_GRAY, 8, 1, 8, 8},     /* tiny Adam7 passes  */
    };
    int n = (int)(sizeof(cases) / sizeof(cases[0]));
    for (int i = 0; i < n; i++) {
        snprintf(pngp, sizeof pngp, "%s/case%d.png", dir, i);
        snprintf(rgbp, sizeof rgbp, "%s/case%d.rgb", dir, i);
        write_case(pngp, cases[i].w, cases[i].h, cases[i].ctype,
                   cases[i].depth, cases[i].interlace);
        dump_rgb(pngp, rgbp);
    }
    printf("%d cases written to %s\n", n, dir);
    return 0;
}
"""


def main() -> None:
    out_dir = pathlib.Path(__file__).resolve().parents[1] \
        / "tests" / "data" / "pngconf"
    out_dir.mkdir(parents=True, exist_ok=True)
    src = pathlib.Path("/tmp/make_png_fixtures.c")
    src.write_text(C_SOURCE)
    exe = "/tmp/make_png_fixtures"
    subprocess.run(["gcc", "-O2", "-o", exe, str(src), "-lpng", "-lz"],
                   check=True)
    subprocess.run([exe, str(out_dir)], check=True)


if __name__ == "__main__":
    sys.exit(main())
