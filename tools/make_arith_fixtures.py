"""Generate arithmetic-coded JPEG conformance fixtures from libjpeg.

Compiles a small C harness against the system libjpeg (present in this
container as a build artifact, no Python binding) and runs it once to
produce, per case, under tests/data/arith/:

- case<N>.jpg   — an arithmetic-coded JPEG (SOF9 sequential or SOF10
                  progressive) written by libjpeg's encoder,
- case<N>.coef  — libjpeg's own entropy-decoded quantized DCT
                  coefficients (jpeg_read_coefficients, natural order),
                  the exact ground truth the pure-Python arithmetic
                  decoder must reproduce bit-for-bit,
- case<N>.rgb   — libjpeg's full RGB decode, a tolerance-based sanity
                  reference (IDCT rounding differs across
                  implementations, so pixels are compared loosely
                  while coefficients are compared exactly).

The fixtures are committed, so the test suite never needs the C
toolchain; re-run this script only to regenerate them. The image
content is a deterministic LCG pattern — no external data.

.coef layout (little-endian): u8 n_components, then per component
u16 h_samp, u16 v_samp, u16 width_in_blocks, u16 height_in_blocks,
then width*height*64 i16 coefficients (blocks row-major, coefficients
in JPEG natural order). .rgb layout: u16 W, u16 H, then W*H*3 bytes.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

C_SOURCE = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

/* deterministic pattern so fixtures are reproducible with no inputs */
static unsigned int lcg_state = 12345u;
static unsigned int lcg(void) {
    lcg_state = lcg_state * 1103515245u + 12345u;
    return (lcg_state >> 16) & 0xFF;
}

static unsigned char *make_image(int w, int h, int gray) {
    int comps = gray ? 1 : 3;
    unsigned char *img = malloc((size_t)w * h * comps);
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
            for (int c = 0; c < comps; c++)
                img[(y * w + x) * comps + c] = (unsigned char)
                    ((x * 7 + y * 3 + c * 31 + (int)lcg() / 4) & 0xFF);
    return img;
}

static void compress_case(const char *path, unsigned char *img,
                          int w, int h, int gray, int progressive,
                          int restart, int h2, int v2, int quality) {
    struct jpeg_compress_struct c;
    struct jpeg_error_mgr err;
    unsigned char *mem = NULL;
    unsigned long memsize = 0;
    c.err = jpeg_std_error(&err);
    jpeg_create_compress(&c);
    jpeg_mem_dest(&c, &mem, &memsize);
    c.image_width = w;
    c.image_height = h;
    c.input_components = gray ? 1 : 3;
    c.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, quality, TRUE);
    c.arith_code = TRUE;
    c.restart_interval = restart;
    if (!gray) {
        c.comp_info[0].h_samp_factor = h2;
        c.comp_info[0].v_samp_factor = v2;
    }
    if (progressive)
        jpeg_simple_progression(&c);
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
        JSAMPROW row = img + (size_t)c.next_scanline * w
                           * (gray ? 1 : 3);
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    jpeg_destroy_compress(&c);
    FILE *f = fopen(path, "wb");
    fwrite(mem, 1, memsize, f);
    fclose(f);
    free(mem);
}

static void put16(FILE *f, unsigned v) {
    fputc(v & 0xFF, f); fputc((v >> 8) & 0xFF, f);
}

static void dump_coefs(const char *jpg, const char *out) {
    struct jpeg_decompress_struct d;
    struct jpeg_error_mgr err;
    d.err = jpeg_std_error(&err);
    jpeg_create_decompress(&d);
    FILE *jf = fopen(jpg, "rb");
    jpeg_stdio_src(&d, jf);
    jpeg_read_header(&d, TRUE);
    jvirt_barray_ptr *arrays = jpeg_read_coefficients(&d);
    FILE *f = fopen(out, "wb");
    fputc(d.num_components, f);
    for (int ci = 0; ci < d.num_components; ci++) {
        jpeg_component_info *comp = &d.comp_info[ci];
        put16(f, comp->h_samp_factor);
        put16(f, comp->v_samp_factor);
        put16(f, comp->width_in_blocks);
        put16(f, comp->height_in_blocks);
        for (JDIMENSION row = 0; row < comp->height_in_blocks; row++) {
            JBLOCKARRAY ba = (*d.mem->access_virt_barray)
                ((j_common_ptr)&d, arrays[ci], row, 1, FALSE);
            for (JDIMENSION col = 0; col < comp->width_in_blocks;
                 col++)
                for (int k = 0; k < DCTSIZE2; k++)
                    put16(f, (unsigned short)(short)ba[0][col][k]);
        }
    }
    fclose(f);
    jpeg_finish_decompress(&d);
    jpeg_destroy_decompress(&d);
    fclose(jf);
}

static void dump_rgb(const char *jpg, const char *out) {
    struct jpeg_decompress_struct d;
    struct jpeg_error_mgr err;
    d.err = jpeg_std_error(&err);
    jpeg_create_decompress(&d);
    FILE *jf = fopen(jpg, "rb");
    jpeg_stdio_src(&d, jf);
    jpeg_read_header(&d, TRUE);
    d.out_color_space = JCS_RGB;
    /* pixel replication, matching the pure-Python decoder's
     * sampling-ratio chroma map (fancy = triangular filter) */
    d.do_fancy_upsampling = FALSE;
    jpeg_start_decompress(&d);
    FILE *f = fopen(out, "wb");
    put16(f, d.output_width);
    put16(f, d.output_height);
    unsigned char *row = malloc((size_t)d.output_width * 3);
    while (d.output_scanline < d.output_height) {
        JSAMPROW rp = row;
        jpeg_read_scanlines(&d, &rp, 1);
        fwrite(row, 1, (size_t)d.output_width * 3, f);
    }
    free(row);
    fclose(f);
    jpeg_finish_decompress(&d);
    jpeg_destroy_decompress(&d);
    fclose(jf);
}

int main(int argc, char **argv) {
    const char *dir = argv[1];
    char jpg[512], coef[512], rgb[512];
    struct { int w, h, gray, prog, restart, h2, v2, q; } cases[] = {
        {32, 16, 1, 0, 0, 1, 1, 85},   /* gray sequential          */
        {35, 21, 0, 0, 2, 2, 2, 75},   /* color 420, restart 2     */
        {24, 24, 0, 1, 0, 1, 1, 90},   /* color 444 progressive    */
        {19, 13, 1, 1, 0, 1, 1, 60},   /* gray progressive, odd    */
        {48, 32, 0, 0, 0, 2, 1, 50},   /* color 422, low quality   */
        {16, 16, 0, 1, 3, 2, 2, 80},   /* color 420 prog + restart */
    };
    int n = (int)(sizeof(cases) / sizeof(cases[0]));
    for (int i = 0; i < n; i++) {
        unsigned char *img = make_image(cases[i].w, cases[i].h,
                                        cases[i].gray);
        snprintf(jpg, sizeof jpg, "%s/case%d.jpg", dir, i);
        snprintf(coef, sizeof coef, "%s/case%d.coef", dir, i);
        snprintf(rgb, sizeof rgb, "%s/case%d.rgb", dir, i);
        compress_case(jpg, img, cases[i].w, cases[i].h, cases[i].gray,
                      cases[i].prog, cases[i].restart, cases[i].h2,
                      cases[i].v2, cases[i].q);
        dump_coefs(jpg, coef);
        dump_rgb(jpg, rgb);
        free(img);
    }
    printf("%d cases written to %s\n", n, dir);
    return 0;
}
"""


def main() -> None:
    out_dir = pathlib.Path(__file__).resolve().parents[1] \
        / "tests" / "data" / "arith"
    out_dir.mkdir(parents=True, exist_ok=True)
    src = pathlib.Path("/tmp/make_arith_fixtures.c")
    src.write_text(C_SOURCE)
    exe = "/tmp/make_arith_fixtures"
    subprocess.run(["gcc", "-O2", "-o", exe, str(src), "-ljpeg"],
                   check=True)
    subprocess.run([exe, str(out_dir)], check=True)


if __name__ == "__main__":
    sys.exit(main())
