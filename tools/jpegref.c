/* libjpeg reference harness for arithmetic-JPEG interop tests.
 *
 * Usage:
 *   jpegref enc  <raw-in> <w> <h> <nc> <quality> <progressive 0|1>
 *                <restart> <jpeg-out>
 *       Encode 8-bit raw pixels (interleaved, row-major) with
 *       arith_code=TRUE, 4:4:4 sampling. nc=1 grayscale, nc=3 RGB→YCbCr.
 *   jpegref coef <jpeg-in> <bin-out>
 *       Dump entropy-decoded DCT coefficients: for each component, an
 *       int32 header (comp index, blocks_h, blocks_w) then int16
 *       coefficients in natural (row-major) order per block.
 *   jpegref dec  <jpeg-in> <raw-out>
 *       Decode to 8-bit raw pixels (interleaved), width/height/nc
 *       printed to stdout as "w h nc".
 *
 * Compiled on demand by tests/test_jpeg_arith.py (gcc -ljpeg); tests
 * skip when the toolchain or an arithmetic-capable libjpeg is absent.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

struct err_mgr {
  struct jpeg_error_mgr pub;
  jmp_buf jb;
};

static void err_exit(j_common_ptr cinfo) {
  struct err_mgr *e = (struct err_mgr *)cinfo->err;
  (*cinfo->err->output_message)(cinfo);
  longjmp(e->jb, 1);
}

static unsigned char *read_all(const char *path, long *n) {
  FILE *f = fopen(path, "rb");
  if (!f) return NULL;
  fseek(f, 0, SEEK_END);
  *n = ftell(f);
  fseek(f, 0, SEEK_SET);
  unsigned char *buf = malloc(*n);
  if (fread(buf, 1, *n, f) != (size_t)*n) { fclose(f); free(buf); return NULL; }
  fclose(f);
  return buf;
}

static int do_enc(int argc, char **argv) {
  const char *raw_path = argv[0];
  int w = atoi(argv[1]), h = atoi(argv[2]), nc = atoi(argv[3]);
  int quality = atoi(argv[4]), progressive = atoi(argv[5]);
  int restart = atoi(argv[6]);
  const char *out_path = argv[7];
  long n;
  unsigned char *raw = read_all(raw_path, &n);
  if (!raw || n != (long)w * h * nc) { fprintf(stderr, "bad raw input\n"); return 1; }

  struct jpeg_compress_struct cinfo;
  struct err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_compress(&cinfo); return 2; }
  jpeg_create_compress(&cinfo);
  FILE *out = fopen(out_path, "wb");
  if (!out) { fprintf(stderr, "cannot open output\n"); return 1; }
  jpeg_stdio_dest(&cinfo, out);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = nc;
  cinfo.in_color_space = nc == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = TRUE;
  /* 4:4:4 so block grids match the pure-Python encoder's geometry */
  for (int ci = 0; ci < cinfo.num_components; ci++) {
    cinfo.comp_info[ci].h_samp_factor = 1;
    cinfo.comp_info[ci].v_samp_factor = 1;
  }
  if (progressive)
    jpeg_simple_progression(&cinfo);
  cinfo.restart_interval = restart;
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = raw + (size_t)cinfo.next_scanline * w * nc;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(out);
  free(raw);
  return 0;
}

static int do_coef(int argc, char **argv) {
  long n;
  unsigned char *data = read_all(argv[0], &n);
  if (!data) { fprintf(stderr, "cannot read jpeg\n"); return 1; }
  struct jpeg_decompress_struct cinfo;
  struct err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return 2; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, n);
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr *arrays = jpeg_read_coefficients(&cinfo);
  FILE *out = fopen(argv[1], "wb");
  if (!out) { fprintf(stderr, "cannot open output\n"); return 1; }
  for (int ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = &cinfo.comp_info[ci];
    int bh = comp->height_in_blocks, bw = comp->width_in_blocks;
    int hdr[3] = {ci, bh, bw};
    fwrite(hdr, sizeof(int), 3, out);
    for (int by = 0; by < bh; by++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, arrays[ci], by, 1, FALSE);
      for (int bx = 0; bx < bw; bx++)
        fwrite(rows[0][bx], sizeof(JCOEF), DCTSIZE2, out);
    }
  }
  fclose(out);
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  free(data);
  return 0;
}

static int do_dec(int argc, char **argv) {
  long n;
  unsigned char *data = read_all(argv[0], &n);
  if (!data) { fprintf(stderr, "cannot read jpeg\n"); return 1; }
  struct jpeg_decompress_struct cinfo;
  struct err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return 2; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, n);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  int nc = cinfo.output_components;
  unsigned char *buf = malloc((size_t)w * h * nc);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = buf + (size_t)cinfo.output_scanline * w * nc;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  FILE *out = fopen(argv[1], "wb");
  if (!out) { fprintf(stderr, "cannot open output\n"); return 1; }
  fwrite(buf, 1, (size_t)w * h * nc, out);
  fclose(out);
  printf("%d %d %d\n", w, h, nc);
  free(buf);
  free(data);
  return 0;
}

int main(int argc, char **argv) {
  if (argc < 2) { fprintf(stderr, "usage: jpegref enc|coef|dec ...\n"); return 1; }
  if (!strcmp(argv[1], "enc") && argc == 10) return do_enc(argc - 2, argv + 2);
  if (!strcmp(argv[1], "coef") && argc == 4) return do_coef(argc - 2, argv + 2);
  if (!strcmp(argv[1], "dec") && argc == 4) return do_dec(argc - 2, argv + 2);
  fprintf(stderr, "bad arguments\n");
  return 1;
}
