// mmtrs_tpu native data loader: threaded JPEG decode + bilinear resize.
//
// Role: the host-side feeding stage of the preprocessing/training pipelines
// (the only part of the framework that is not JAX). The reference does this
// with per-image PIL/cv2 calls inside DataLoader workers; here a C++ thread
// pool decodes a whole batch directly into one contiguous [N,H,W,3] uint8
// buffer that the Python side hands to jax.device_put — zero intermediate
// copies, no GIL on the decode path.
//
// C API (ctypes-friendly):
//   int mmtrs_decode_batch(const char** paths, int n,
//                          unsigned char* out, int out_h, int out_w,
//                          int min_edge, int num_threads, int* status);
//     status[i]: 0 ok, 1 rejected (min edge), 2 decode error
//   int mmtrs_encode_jpeg(const char* path, const unsigned char* data,
//                         int h, int w, int quality);
//
// Build: g++ -O3 -shared -fPIC loader.cpp -ljpeg -o libmmtrs_loader.so

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jump, 1);
}

// Decode one JPEG file to RGB8. Returns true on success.
bool decode_jpeg(const char* path, std::vector<unsigned char>& pixels,
                 int& h, int& w) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    w = cinfo.output_width;
    h = cinfo.output_height;
    pixels.resize(static_cast<size_t>(h) * w * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char* row = pixels.data() +
            static_cast<size_t>(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return true;
}

// Classic half-pixel-centre bilinear resize, RGB8 (matches the cv2/JAX
// semantics used on device; see mmtrs_tpu/ops/resize.py).
void resize_bilinear(const unsigned char* src, int sh, int sw,
                     unsigned char* dst, int dh, int dw) {
    const float sy = static_cast<float>(sh) / dh;
    const float sx = static_cast<float>(sw) / dw;
    for (int y = 0; y < dh; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
        int y0 = static_cast<int>(fy);
        int y1 = std::min(y0 + 1, sh - 1);
        float wy = fy - y0;
        for (int x = 0; x < dw; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
            int x0 = static_cast<int>(fx);
            int x1 = std::min(x0 + 1, sw - 1);
            float wx = fx - x0;
            for (int c = 0; c < 3; ++c) {
                const float v00 = src[(static_cast<size_t>(y0) * sw + x0) * 3 + c];
                const float v01 = src[(static_cast<size_t>(y0) * sw + x1) * 3 + c];
                const float v10 = src[(static_cast<size_t>(y1) * sw + x0) * 3 + c];
                const float v11 = src[(static_cast<size_t>(y1) * sw + x1) * 3 + c];
                const float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                                v10 * wy * (1 - wx) + v11 * wy * wx;
                dst[(static_cast<size_t>(y) * dw + x) * 3 + c] =
                    static_cast<unsigned char>(v + 0.5f);
            }
        }
    }
}

}  // namespace

extern "C" {

int mmtrs_decode_batch(const char** paths, int n, unsigned char* out,
                       int out_h, int out_w, int min_edge, int num_threads,
                       int* status) {
    std::atomic<int> next(0);
    const size_t img_stride = static_cast<size_t>(out_h) * out_w * 3;

    auto worker = [&]() {
        std::vector<unsigned char> pixels;
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) break;
            int h = 0, w = 0;
            if (!decode_jpeg(paths[i], pixels, h, w)) {
                status[i] = 2;
                continue;
            }
            if (min_edge > 0 && std::min(h, w) < min_edge) {
                status[i] = 1;
                continue;
            }
            resize_bilinear(pixels.data(), h, w, out + img_stride * i, out_h, out_w);
            status[i] = 0;
        }
    };

    const int nt = std::max(1, std::min(num_threads, n));
    std::vector<std::thread> threads;
    threads.reserve(nt);
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    int ok = 0;
    for (int i = 0; i < n; ++i) ok += (status[i] == 0);
    return ok;
}

int mmtrs_encode_jpeg(const char* path, const unsigned char* data, int h,
                      int w, int quality) {
    FILE* f = fopen(path, "wb");
    if (!f) return 1;
    jpeg_compress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_compress(&cinfo);
        fclose(f);
        return 2;
    }
    jpeg_create_compress(&cinfo);
    jpeg_stdio_dest(&cinfo, f);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = const_cast<JSAMPROW>(
            data + static_cast<size_t>(cinfo.next_scanline) * w * 3);
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    fclose(f);
    return 0;
}

}  // extern "C"
