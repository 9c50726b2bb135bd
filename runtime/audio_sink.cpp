// Audio output sink — the output-side data-plane transport.
//
// Plays the role of the reference's codec DAC path: the I2S/SAI DMA TX
// double buffer the ISR writes demodulated audio into
// (`drivers/audio/uhsdr_hw_i2s.c`, `audio_driver.c:2845-2941` output
// conversion) plus the USB audio OUT stream (`usbd_audio_if.c`).  The DSP
// loop pushes float32 blocks and never blocks on disk I/O or the
// f32->int16 conversion; a writer thread drains a ring of blocks into a
// 16-bit PCM WAV (header patched on close).  Overflow (consumer slower
// than producer) drops whole blocks and counts them — the analog of the
// reference's FreeDV TX underrun counter (`misc/profiling.h:29`).
//
// C ABI (ctypes-friendly):
//   h = uhsdr_sink_open(path, sample_rate, channels, block_samples,
//                       ring_blocks)
//   ok = uhsdr_sink_push(h, f32* interleaved, n_samples_per_channel)
//   dropped = uhsdr_sink_dropped(h)
//   written = uhsdr_sink_written(h)        // frames on disk so far
//   uhsdr_sink_close(h)                    // flush + patch WAV header
//
// Build: g++ -O3 -shared -fPIC -o libuhsdr_sink.so audio_sink.cpp -lpthread
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Sink {
    FILE* f = nullptr;
    int channels = 1;
    long sample_rate = 48000;
    long block = 0;                  // samples per channel per block
    std::vector<std::vector<float>> ring;
    std::vector<long> ring_n;        // valid samples/ch in each slot
    size_t head = 0, tail = 0, count = 0;
    std::atomic<long> dropped{0};
    std::atomic<long> written{0};    // frames written to disk
    std::atomic<bool> stop{false};
    std::mutex mu;
    std::condition_variable cv;
    std::thread writer;
    std::vector<int16_t> conv;
};

void write_wav_header(FILE* f, int channels, long rate, uint32_t data_bytes) {
    uint32_t byte_rate = (uint32_t)(rate * channels * 2);
    uint16_t block_align = (uint16_t)(channels * 2);
    uint32_t riff = 36 + data_bytes;
    unsigned char h[44];
    memcpy(h, "RIFF", 4);
    memcpy(h + 4, &riff, 4);
    memcpy(h + 8, "WAVEfmt ", 8);
    uint32_t fmt_size = 16; memcpy(h + 16, &fmt_size, 4);
    uint16_t pcm = 1; memcpy(h + 20, &pcm, 2);
    uint16_t ch = (uint16_t)channels; memcpy(h + 22, &ch, 2);
    uint32_t sr = (uint32_t)rate; memcpy(h + 24, &sr, 4);
    memcpy(h + 28, &byte_rate, 4);
    memcpy(h + 32, &block_align, 2);
    uint16_t bits = 16; memcpy(h + 34, &bits, 2);
    memcpy(h + 36, "data", 4);
    memcpy(h + 40, &data_bytes, 4);
    fseek(f, 0, SEEK_SET);
    fwrite(h, 1, 44, f);
}

void writer_loop(Sink* s) {
    for (;;) {
        std::unique_lock<std::mutex> lk(s->mu);
        s->cv.wait(lk, [s] { return s->count > 0 || s->stop.load(); });
        if (s->count == 0 && s->stop.load()) break;
        float* data = s->ring[s->tail].data();
        long n = s->ring_n[s->tail];
        lk.unlock();

        long total = n * s->channels;
        s->conv.resize(total);
        for (long i = 0; i < total; i++) {
            float v = data[i] * 32767.0f;
            if (v > 32767.0f) v = 32767.0f;
            if (v < -32768.0f) v = -32768.0f;
            s->conv[i] = (int16_t)lrintf(v);
        }
        fwrite(s->conv.data(), 2, total, s->f);
        s->written.fetch_add(n);

        lk.lock();
        s->tail = (s->tail + 1) % s->ring.size();
        s->count--;
        lk.unlock();
        s->cv.notify_all();
    }
    fflush(s->f);
}

}  // namespace

extern "C" {

void* uhsdr_sink_open(const char* path, long sample_rate, int channels,
                      long block_samples, long ring_blocks) {
    if (channels < 1 || channels > 2 || block_samples <= 0 ||
        ring_blocks < 2)
        return nullptr;
    FILE* f = fopen(path, "wb");
    if (!f) return nullptr;
    Sink* s = new Sink();
    s->f = f;
    s->channels = channels;
    s->sample_rate = sample_rate;
    s->block = block_samples;
    s->ring.assign((size_t)ring_blocks,
                   std::vector<float>((size_t)(block_samples * channels)));
    s->ring_n.assign((size_t)ring_blocks, 0);
    write_wav_header(f, channels, sample_rate, 0);
    s->writer = std::thread(writer_loop, s);
    return s;
}

// data: interleaved f32, n samples per channel (n <= block_samples).
// Returns 1 if queued, 0 if dropped (ring full — counted).
int uhsdr_sink_push(void* handle, const float* data, long n) {
    Sink* s = (Sink*)handle;
    if (!s || n <= 0 || n > s->block) return 0;
    {
        std::lock_guard<std::mutex> lk(s->mu);
        if (s->count == s->ring.size()) {
            s->dropped.fetch_add(1);
            return 0;
        }
        memcpy(s->ring[s->head].data(), data,
               sizeof(float) * (size_t)(n * s->channels));
        s->ring_n[s->head] = n;
        s->head = (s->head + 1) % s->ring.size();
        s->count++;
    }
    s->cv.notify_all();
    return 1;
}

long uhsdr_sink_dropped(void* handle) {
    Sink* s = (Sink*)handle;
    return s ? s->dropped.load() : -1;
}

long uhsdr_sink_written(void* handle) {
    Sink* s = (Sink*)handle;
    return s ? s->written.load() : -1;
}

void uhsdr_sink_close(void* handle) {
    Sink* s = (Sink*)handle;
    if (!s) return;
    s->stop.store(true);
    s->cv.notify_all();
    if (s->writer.joinable()) s->writer.join();
    uint32_t data_bytes =
        (uint32_t)(s->written.load() * s->channels * 2);
    write_wav_header(s->f, s->channels, s->sample_rate, data_bytes);
    fclose(s->f);
    delete s;
}

}  // extern "C"
