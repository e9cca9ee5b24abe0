// Fake libSoapySDR implementing the C-ABI subset gnuradio4_tpu/blocks/soapy.py
// binds (≈ the reference's LoopbackDevice strategy at the library boundary):
// one virtual RX device producing a deterministic complex tone at a fixed RF
// frequency, mixed to baseband around the tuned center frequency.
//
// Built by tests/test_soapy.py:
//   g++ -O2 -shared -fPIC -std=c++20 fake_soapy.cpp -o libFakeSoapySDR.so

#include <cmath>
#include <complex>
#include <cstddef>
#include <cstring>

namespace {
constexpr double kToneRf = 100.05e6;   // the "station" on the air
struct Device {
    double sample_rate = 1e6;
    double center = 100e6;
    double gain = 0.0;
    long long pos = 0;
    bool active = false;
};
struct Kwargs {
    std::size_t size;
    char** keys;
    char** vals;
};
Device g_device;   // one fake dongle
} // namespace

extern "C" {

Kwargs* SoapySDRDevice_enumerate(const Kwargs*, std::size_t* length) {
    if (length) {
        *length = 1;
    }
    return nullptr;   // callers here only use the count
}

void* SoapySDRDevice_make(const Kwargs*) { return &g_device; }

int SoapySDRDevice_unmake(void*) { return 0; }

int SoapySDRDevice_setSampleRate(void* d, int, std::size_t, double rate) {
    static_cast<Device*>(d)->sample_rate = rate;
    return 0;
}

double SoapySDRDevice_getSampleRate(void* d, int, std::size_t) {
    return static_cast<Device*>(d)->sample_rate;
}

int SoapySDRDevice_setFrequency(void* d, int, std::size_t, double f,
                                const Kwargs*) {
    static_cast<Device*>(d)->center = f;
    return 0;
}

int SoapySDRDevice_setGain(void* d, int, std::size_t, double g) {
    static_cast<Device*>(d)->gain = g;
    return 0;
}

void* SoapySDRDevice_setupStream(void* d, int, const char* format,
                                 const std::size_t*, std::size_t,
                                 const Kwargs*) {
    if (std::strcmp(format, "CF32") != 0) {
        return nullptr;
    }
    return d;   // stream handle == device
}

int SoapySDRDevice_activateStream(void* d, void*, int, long long, std::size_t) {
    static_cast<Device*>(d)->active = true;
    return 0;
}

int SoapySDRDevice_deactivateStream(void* d, void*, int, long long) {
    static_cast<Device*>(d)->active = false;
    return 0;
}

int SoapySDRDevice_closeStream(void*, void*) { return 0; }

int SoapySDRDevice_readStream(void* dv, void*, void* const* buffs,
                              std::size_t numElems, int* flags,
                              long long* timeNs, long) {
    auto* d = static_cast<Device*>(dv);
    if (!d->active) {
        return -1;
    }
    auto* out = static_cast<std::complex<float>*>(buffs[0]);
    const double amp = std::pow(10.0, d->gain / 20.0) * 0.5;
    const double w = 2.0 * M_PI * (kToneRf - d->center) / d->sample_rate;
    for (std::size_t i = 0; i < numElems; i++) {
        const double ph = w * static_cast<double>(d->pos + (long long)i);
        out[i] = {static_cast<float>(amp * std::cos(ph)),
                  static_cast<float>(amp * std::sin(ph))};
    }
    d->pos += static_cast<long long>(numElems);
    if (flags) {
        *flags = 0;
    }
    if (timeNs) {
        *timeNs = d->pos;
    }
    return static_cast<int>(numElems);
}

} // extern "C"
