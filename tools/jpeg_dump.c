/* jpeg_dump — ground-truth decoder for A/B-testing swishray's
 * from-scratch JPEG codec (swishray/ops/jpeg.py) against libjpeg-turbo.
 *
 * Usage: jpeg_dump FILE > out.pnm
 * Emits P5 (grayscale), P6 (RGB) or — for 4-component CMYK/YCCK
 * files — a "P7 4" header followed by raw 4-channel samples
 * (libjpeg's JCS_CMYK output, no inversion applied).
 *
 * Fancy (interpolating) chroma upsampling is disabled so libjpeg uses
 * the same sample-replication upsampling the Python decoder
 * implements; remaining differences are IDCT/color-convert rounding,
 * which the test bounds (see tests/test_jpeg.py).
 *
 * Build: gcc -O2 -o jpeg_dump jpeg_dump.c -ljpeg
 */
#include <setjmp.h>
#include <stdio.h>
#include <stdlib.h>

#include <jpeglib.h>

struct err_mgr {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
};

static void on_error(j_common_ptr cinfo)
{
    struct err_mgr *e = (struct err_mgr *)cinfo->err;
    (*cinfo->err->output_message)(cinfo);
    longjmp(e->jb, 1);
}

int main(int argc, char **argv)
{
    if (argc != 2) {
        fprintf(stderr, "usage: %s FILE\n", argv[0]);
        return 2;
    }
    FILE *in = fopen(argv[1], "rb");
    if (!in) {
        perror(argv[1]);
        return 2;
    }
    struct jpeg_decompress_struct cinfo;
    struct err_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = on_error;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(in);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, in);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.do_fancy_upsampling = FALSE;  /* replication, like ours */
    cinfo.dct_method = JDCT_FLOAT;
    jpeg_start_decompress(&cinfo);
    int w = cinfo.output_width, h = cinfo.output_height;
    int nc = cinfo.output_components;
    if (nc == 4)
        printf("P7 4\n%d %d\n255\n", w, h);
    else
        printf("P%d\n%d %d\n255\n", nc == 1 ? 5 : 6, w, h);
    JSAMPROW row = malloc((size_t)w * nc);
    while ((int)cinfo.output_scanline < h) {
        jpeg_read_scanlines(&cinfo, &row, 1);
        fwrite(row, 1, (size_t)w * nc, stdout);
    }
    free(row);
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(in);
    return 0;
}
