// C++ embedder driving the RAII layer (trackie_ffi.hpp) over the
// stable C ABI — the C++ twin of examples/embed_demo.c.
//
// Parity: the reference's C++ RAII API consumers
// (src/ffi/c_api/tk_ffi_cpp_api.hpp). Exercises: RAII tensors
// (fill/add/matmul incl. blocked), audio stream, vision frame, a
// lambda module executor behind ModuleGuard, sync + async module
// commands, drain, and error surfacing via exceptions.
//
// Built + run by `make native`.

#include <atomic>
#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>

#include "trackie_ffi.hpp"

int main() {
    std::printf("trackie (C++ RAII) %s\n", tk::version().c_str());

    // --- tensors ---------------------------------------------------------
    tk::Tensor a = tk::Tensor::zeros({2, 3});
    a.fill(2.0);
    tk::Tensor b = tk::Tensor::zeros({2, 3});
    b.fill(3.0);
    tk::Tensor c = a + b;
    assert(std::fabs(c.floats()[0] - 5.0f) < 1e-6);

    tk::Tensor m1 = tk::Tensor::zeros({2, 4});
    m1.fill(1.0);
    tk::Tensor m2 = tk::Tensor::zeros({4, 3});
    m2.fill(2.0);
    tk::Tensor mm = m1.matmul(m2);
    assert(std::fabs(mm.floats()[0] - 8.0f) < 1e-6);
    tk::Tensor mb = m1.matmul(m2, /*block_size=*/2);
    assert(std::fabs(mb.floats()[0] - 8.0f) < 1e-6);
    mm.reshape({3, 2});
    assert(mm.shape() == (std::vector<int64_t>{3, 2}));
    std::printf("tensors: add/matmul/blocked/reshape OK\n");

    // --- media handles ----------------------------------------------------
    tk::AudioStream stream(TK_AUDIO_F32, 16000, 1, 1024);
    float samples[256];
    for (int i = 0; i < 256; ++i) samples[i] = 0.01f * i;
    size_t w = stream.write(samples, 256);
    assert(w == 256);
    float back[256];
    size_t r = stream.read(back, 256);
    assert(r == 256 && std::fabs(back[255] - 2.55f) < 1e-5);

    tk::VisionFrame frame(TK_PIXEL_RGB24, 64, 48);
    auto [pix, nbytes] = frame.mutable_data();
    assert(nbytes == 64u * 48u * 3u);
    std::memset(pix, 127, nbytes);
    assert(frame.info().width == 64);
    std::printf("media: audio FIFO + vision frame OK\n");

    // --- module bus -------------------------------------------------------
    tk::Context ctx;
    {
        tk::ModuleGuard guard(
            ctx, TK_MODULE_CUSTOM_BASE + 7,
            [](const std::string& cmd, const tk::Tensor* input) {
                if (cmd != "square")
                    throw std::runtime_error("unknown command");
                auto shape = input->shape();
                tk::Tensor out = tk::Tensor::create(TK_F32, shape);
                const float* in = input->floats();
                auto [p, n] = out.mutable_data();
                float* o = static_cast<float*>(p);
                for (size_t i = 0; i < n / sizeof(float); ++i)
                    o[i] = in[i] * in[i];
                return out;
            });

        tk::Tensor x = tk::Tensor::zeros({4});
        x.fill(3.0);
        auto res = ctx.execute(TK_MODULE_CUSTOM_BASE + 7, "square", &x);
        assert(res && std::fabs(res->floats()[0] - 9.0f) < 1e-6);

        std::atomic<int> fired{0};
        ctx.execute_async(
            TK_MODULE_CUSTOM_BASE + 7, "square", &x,
            [&fired](TkStatus s, std::optional<tk::Tensor> t) {
                assert(s == TK_OK && t);
                assert(std::fabs(t->floats()[1] - 9.0f) < 1e-6);
                fired.fetch_add(1);
            });
        ctx.drain();
        assert(fired.load() == 1);

        // Error surfacing: unknown command -> exception with status.
        bool threw = false;
        try {
            ctx.execute(TK_MODULE_CUSTOM_BASE + 7, "nope", &x);
        } catch (const tk::Error& e) {
            threw = e.status() != TK_OK;
        }
        assert(threw);
        std::printf("module bus: sync/async/error OK\n");
    }  // guard unregisters (+drains) here

    bool unregistered = false;
    try {
        tk::Tensor x = tk::Tensor::zeros({1});
        ctx.execute(TK_MODULE_CUSTOM_BASE + 7, "square", &x);
    } catch (const tk::Error&) {
        unregistered = true;
    }
    assert(unregistered);
    std::printf("embed_demo_cpp: ALL OK\n");
    return 0;
}
