// Native batched WAV loader for the speakerguard_tpu input pipeline.
//
// The reference feeds the device through torch DataLoader workers
// (natural_train.py:106, num_workers).  Here a small C++ library decodes a
// whole batch of PCM16 WAV files into one preallocated float32 buffer with
// crop/pad applied, using a std::thread pool — one syscall-bound pass, no
// Python in the loop.  Bound via ctypes (see
// speakerguard_tpu/utils/native.py); scipy fallback when not built.
//
// Only canonical RIFF/WAVE PCM16 mono/stereo files are handled (everything
// the datasets contain); anything else returns an error code and the
// caller falls back.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>
#include <atomic>

namespace {

struct WavInfo {
    long data_offset;
    long num_samples;   // per channel
    int channels;
    int bits;
};

// Parse the RIFF header; returns false on anything non-PCM16.
bool parse_header(FILE* f, WavInfo* info) {
    char chunk[4];
    uint32_t size;
    if (fread(chunk, 1, 4, f) != 4 || memcmp(chunk, "RIFF", 4) != 0)
        return false;
    if (fread(&size, 4, 1, f) != 1) return false;
    if (fread(chunk, 1, 4, f) != 4 || memcmp(chunk, "WAVE", 4) != 0)
        return false;

    uint16_t audio_format = 0, channels = 0, bits = 0;
    bool have_fmt = false;
    while (fread(chunk, 1, 4, f) == 4 && fread(&size, 4, 1, f) == 1) {
        if (memcmp(chunk, "fmt ", 4) == 0) {
            unsigned char buf[16];
            if (size < 16 || fread(buf, 1, 16, f) != 16) return false;
            audio_format = buf[0] | (buf[1] << 8);
            channels = buf[2] | (buf[3] << 8);
            bits = buf[14] | (buf[15] << 8);
            if (size > 16) fseek(f, size - 16, SEEK_CUR);
            have_fmt = true;
        } else if (memcmp(chunk, "data", 4) == 0) {
            if (!have_fmt || audio_format != 1 || bits != 16 ||
                channels < 1 || channels > 2)
                return false;
            info->data_offset = ftell(f);
            info->channels = channels;
            info->bits = bits;
            info->num_samples = (long)size / (bits / 8) / channels;
            return true;
        } else {
            fseek(f, (size + 1) & ~1u, SEEK_CUR);
        }
    }
    return false;
}

// Load one file: out[0..wav_length) float32, channel 0, scaled by `scale`,
// cropped at `start` (clamped) and zero-padded.
int load_one(const char* path, float* out, long wav_length, long start,
             float scale) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    WavInfo info;
    if (!parse_header(f, &info)) { fclose(f); return 2; }

    long n = info.num_samples;
    long want = wav_length > 0 ? wav_length : n;
    if (start > n - want) start = n > want ? n - want : 0;
    if (start < 0) start = 0;
    long avail = n - start;
    long copy = avail < want ? avail : want;

    fseek(f, info.data_offset + start * 2 * info.channels, SEEK_SET);
    std::vector<int16_t> buf(copy * info.channels);
    size_t got = fread(buf.data(), 2 * info.channels, copy, f);
    fclose(f);
    if ((long)got != copy) return 3;

    const float k = scale / 32768.0f;
    for (long i = 0; i < copy; ++i)
        out[i] = buf[i * info.channels] * k;
    for (long i = copy; i < want; ++i) out[i] = 0.0f;
    return 0;
}

}  // namespace

extern "C" {

// Returns number of samples (for probing lengths); -1 on error.
long wav_num_samples(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    WavInfo info;
    bool ok = parse_header(f, &info);
    fclose(f);
    return ok ? info.num_samples : -1;
}

// Batched load: paths[i] -> out + i*wav_length.  starts[i] = crop offset.
// scale: e.g. 1.0 for [-1,1) or 32768.0 for the int16 "origin" domain.
// Returns 0 if all files loaded, else the first nonzero per-file code.
int load_wav_batch(const char** paths, int n, float* out, long wav_length,
                   const long* starts, float scale, int n_threads) {
    std::atomic<int> err{0};
    std::atomic<int> next{0};
    auto worker = [&]() {
        int i;
        while ((i = next.fetch_add(1)) < n) {
            int e = load_one(paths[i], out + (long)i * wav_length,
                             wav_length, starts[i], scale);
            if (e && !err.load()) err.store(e);
        }
    };
    int nt = n_threads > 0 ? n_threads : 4;
    if (nt > n) nt = n;
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
    return err.load();
}

}  // extern "C"
