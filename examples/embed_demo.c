/* Minimal C embedder driving the trackiellm_tpu stable C ABI.
 *
 * Demonstrates the external-consumer contract the reference exposes
 * through its FFI (reference: src/ffi/c_api/tk_ffi_api.h): create a
 * context, register a module executor, push tensors through the module
 * command bus (sync + async), and use the tensor math / media handles.
 *
 * Build + run (from the repo root):
 *   g++ -O2 -shared -fPIC -std=c++17 -pthread \
 *       -o trackiellm_tpu/ffi/native/libtrackie_runtime.so \
 *       trackiellm_tpu/ffi/native/trackie_runtime.cpp \
 *       trackiellm_tpu/ffi/native/trackie_ffi.cpp
 *   gcc -O2 -o /tmp/embed_demo examples/embed_demo.c \
 *       -Itrackiellm_tpu/ffi/native \
 *       -Ltrackiellm_tpu/ffi/native -ltrackie_runtime \
 *       -Wl,-rpath,$PWD/trackiellm_tpu/ffi/native
 *   /tmp/embed_demo
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "trackie_ffi.h"

/* A module executor: doubles every f32 element of the input tensor. */
static TkStatus double_executor(const char* command, const TkTensor* input,
                                TkTensor** output, void* state) {
    (void)state;
    if (strcmp(command, "double") != 0) return TK_ERR_INVALID_ARGUMENT;
    const void* data;
    size_t nbytes;
    if (tk_tensor_get_data(input, &data, &nbytes) != TK_OK)
        return TK_ERR_OPERATION_FAILED;
    size_t ndims = TK_TENSOR_MAX_DIMS;
    int64_t shape[TK_TENSOR_MAX_DIMS];
    tk_tensor_get_shape(input, shape, &ndims);
    TkTensor* out = NULL;
    if (tk_tensor_create(&out, TK_F32, shape, ndims) != TK_OK)
        return TK_ERR_ALLOCATION_FAILED;
    void* odata;
    size_t obytes;
    tk_tensor_get_mutable_data(out, &odata, &obytes);
    const float* in = (const float*)data;
    float* o = (float*)odata;
    for (size_t i = 0; i < nbytes / 4; i++) o[i] = in[i] * 2.0f;
    *output = out;
    return TK_OK;
}

static int g_async_ok = 0;

static void on_done(TkStatus status, TkTensor* result, void* user_data) {
    (void)user_data;
    if (status == TK_OK && result) {
        const void* data;
        size_t n;
        tk_tensor_get_data(result, &data, &n);
        g_async_ok = (((const float*)data)[0] == 6.0f);
        tk_tensor_destroy(&result);
    }
}

int main(void) {
    printf("trackie version: %s\n", tk_version_string());

    TkContext* ctx = NULL;
    if (tk_context_create(&ctx) != TK_OK) {
        fprintf(stderr, "context: %s\n", tk_ffi_last_error());
        return 1;
    }
    tk_context_register_module(ctx, TK_MODULE_CUSTOM_BASE,
                               double_executor, NULL);

    /* tensor math */
    int64_t shape[2] = {2, 3};
    TkTensor *a = NULL, *b = NULL, *c = NULL;
    tk_tensor_create(&a, TK_F32, shape, 2);
    tk_tensor_create(&b, TK_F32, shape, 2);
    tk_tensor_create(&c, TK_F32, shape, 2);
    tk_tensor_fill(a, 1.5);
    tk_tensor_fill(b, 2.0);
    tk_tensor_add(a, b, c);

    int64_t mshape[2] = {3, 2};
    TkTensor *m = NULL, *mm = NULL;
    tk_tensor_create(&m, TK_F32, mshape, 2);
    tk_tensor_fill(m, 1.0);
    int64_t oshape[2] = {2, 2};
    tk_tensor_create(&mm, TK_F32, oshape, 2);
    tk_tensor_matmul_blocked(c, m, mm, 0);
    const void* mdata;
    size_t mb;
    tk_tensor_get_data(mm, &mdata, &mb);
    printf("matmul[0][0] = %.1f (want 10.5)\n", ((const float*)mdata)[0]);

    /* sync module command */
    TkTensor* tripled = NULL;
    tk_tensor_fill(a, 3.0);
    TkStatus s = tk_module_execute_command(ctx, TK_MODULE_CUSTOM_BASE,
                                           "double", a, &tripled, NULL,
                                           NULL);
    const void* tdata;
    size_t tb;
    tk_tensor_get_data(tripled, &tdata, &tb);
    printf("sync double -> %.1f (want 6.0, status %d)\n",
           ((const float*)tdata)[0], s);

    /* async module command */
    tk_module_execute_command(ctx, TK_MODULE_CUSTOM_BASE, "double", a,
                              NULL, on_done, NULL);
    tk_context_drain(ctx);
    printf("async double ok: %d\n", g_async_ok);

    /* media handles */
    TkAudioStream* stream = NULL;
    tk_audio_stream_create(&stream, TK_AUDIO_F32, 16000, 1, 1600);
    float frames[160] = {0.5f};
    size_t written = 0;
    tk_audio_stream_write(stream, frames, 160, &written);
    printf("audio frames written: %zu\n", written);

    TkVisionFrame* frame = NULL;
    tk_vision_frame_create(&frame, TK_PIXEL_RGB24, 64, 48);
    TkPixelFormat fmt;
    uint32_t w, h;
    tk_vision_frame_get_info(frame, &fmt, &w, &h);
    printf("vision frame: %ux%u fmt=%d\n", w, h, (int)fmt);

    tk_vision_frame_destroy(&frame);
    tk_audio_stream_destroy(&stream);
    tk_tensor_destroy(&tripled);
    tk_tensor_destroy(&a);
    tk_tensor_destroy(&b);
    tk_tensor_destroy(&c);
    tk_tensor_destroy(&m);
    tk_tensor_destroy(&mm);
    tk_context_destroy(&ctx);
    printf("OK\n");
    return 0;
}
