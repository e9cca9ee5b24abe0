// Fake libasound implementing the C-ABI subset gnuradio4_tpu/blocks/alsa.py
// binds: one virtual full-duplex PCM that captures a deterministic 440 Hz
// tone and records playback frames (readable back via a test-only hook).
//
// Built by tests/test_alsa.py:
//   g++ -O2 -shared -fPIC -std=c++20 fake_alsa.cpp -o libFakeAsound.so

#include <cmath>
#include <cstddef>
#include <cstring>
#include <vector>

namespace {
struct Pcm {
    int stream = 0;            // 0 playback, 1 capture
    unsigned channels = 1;
    unsigned rate = 48000;
    long long pos = 0;
};
Pcm g_capture, g_playback;
std::vector<float> g_played;
} // namespace

extern "C" {

int snd_pcm_open(void** pcmp, const char*, int stream, int) {
    Pcm* p = (stream == 1) ? &g_capture : &g_playback;
    p->stream = stream;
    p->pos = 0;
    if (stream == 0) {
        g_played.clear();
    }
    *pcmp = p;
    return 0;
}

int snd_pcm_set_params(void* pcm, int format, int access, unsigned channels,
                       unsigned rate, int, unsigned) {
    if (format != 14 || access != 3) {   // FLOAT_LE, RW_INTERLEAVED only
        return -22;
    }
    auto* p = static_cast<Pcm*>(pcm);
    p->channels = channels;
    p->rate = rate;
    return 0;
}

long snd_pcm_readi(void* pcm, void* buffer, unsigned long frames) {
    auto* p = static_cast<Pcm*>(pcm);
    auto* out = static_cast<float*>(buffer);
    for (unsigned long i = 0; i < frames; i++) {
        const double ph =
            2.0 * M_PI * 440.0 * static_cast<double>(p->pos + (long long)i) /
            p->rate;
        for (unsigned c = 0; c < p->channels; c++) {
            out[i * p->channels + c] = static_cast<float>(0.5 * std::sin(ph));
        }
    }
    p->pos += static_cast<long long>(frames);
    return static_cast<long>(frames);
}

long snd_pcm_writei(void* pcm, const void* buffer, unsigned long frames) {
    auto* p = static_cast<Pcm*>(pcm);
    const auto* in = static_cast<const float*>(buffer);
    g_played.insert(g_played.end(), in, in + frames * p->channels);
    p->pos += static_cast<long long>(frames);
    return static_cast<long>(frames);
}

int snd_pcm_recover(void*, int, int) { return 0; }

int snd_pcm_close(void*) { return 0; }

// test-only hook: copy out what was played
unsigned long fake_alsa_played(float* dst, unsigned long max_n) {
    const unsigned long n =
        g_played.size() < max_n ? g_played.size() : max_n;
    std::memcpy(dst, g_played.data(), n * sizeof(float));
    return n;
}

} // extern "C"
