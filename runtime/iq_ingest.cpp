// IQ capture ingest engine — the data-plane transport of the framework.
//
// Plays the role the reference's I2S/SAI DMA double-buffering and USB
// isochronous audio streaming play (`drivers/audio/uhsdr_hw_i2s.c`,
// `drivers/usb/.../usbd_audio_if.c`): a producer thread streams IQ
// sample files (raw interleaved int16 I/Q, or 16-bit stereo WAV) into a
// ring of pre-converted float32 blocks; the consumer (Python/JAX feed)
// pops blocks without ever blocking on disk I/O or int16->f32 conversion.
//
// C ABI (ctypes-friendly):
//   handle = uhsdr_ingest_open(path, block_samples, ring_blocks, loop)
//   handle = uhsdr_ingest_open2(path, block, ring, loop, raw_i16)
//   n = uhsdr_ingest_next(handle, i_out, q_out)   // block_samples floats
//   n = uhsdr_ingest_next_i16(handle, i_out, q_out)  // raw_i16 mode: the
//       ring stores the UNCONVERTED int16 planes (half the ring memory
//       and memcpy traffic); feeds the chain's int16 ingest path, which
//       converts on the TPU in VMEM (pallas/fir in_scale)
//   uhsdr_ingest_close(handle)
//
// Build: g++ -O3 -shared -fPIC -o libuhsdr_ingest.so iq_ingest.cpp -lpthread
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavInfo {
    long data_offset = 0;
    long data_bytes = -1;  // -1: until EOF
    int channels = 2;
    int bits = 16;
};

// Minimal RIFF/WAVE parser: finds the 'data' chunk of a 16-bit PCM file.
bool parse_wav(FILE* f, WavInfo* info) {
    unsigned char hdr[12];
    if (fread(hdr, 1, 12, f) != 12) return false;
    if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0)
        return false;
    unsigned char ch[8];
    while (fread(ch, 1, 8, f) == 8) {
        uint32_t size = ch[4] | (ch[5] << 8) | (ch[6] << 16) |
                        ((uint32_t)ch[7] << 24);
        if (memcmp(ch, "fmt ", 4) == 0) {
            std::vector<unsigned char> fmt(size);
            if (fread(fmt.data(), 1, size, f) != size) return false;
            info->channels = fmt[2] | (fmt[3] << 8);
            info->bits = fmt[14] | (fmt[15] << 8);
        } else if (memcmp(ch, "data", 4) == 0) {
            info->data_offset = ftell(f);
            info->data_bytes = size;
            return info->bits == 16 && info->channels == 2;
        } else {
            fseek(f, size + (size & 1), SEEK_CUR);
        }
    }
    return false;
}

struct Ingest {
    FILE* file = nullptr;
    WavInfo wav;
    bool is_wav = false;
    bool loop = false;
    long block_samples = 0;
    long ring_blocks = 0;

    bool raw = false;                 // raw_i16 mode: ring holds int16

    // ring of converted blocks: [slot][i-plane | q-plane]
    std::vector<float> ring;
    std::vector<int16_t> ring16;      // raw mode storage (instead of ring)
    std::vector<long> valid;          // samples valid per slot
    std::atomic<long> head{0};        // produced count
    std::atomic<long> tail{0};        // consumed count
    std::atomic<bool> eof{false};
    std::atomic<bool> stop{false};
    std::mutex mu;
    std::condition_variable cv_prod, cv_cons;
    std::thread producer;

    std::vector<int16_t> scratch;

    float* slot_i(long s) { return ring.data() + (s % ring_blocks) * 2 * block_samples; }
    float* slot_q(long s) { return slot_i(s) + block_samples; }
    int16_t* slot_i16(long s) { return ring16.data() + (s % ring_blocks) * 2 * block_samples; }
    int16_t* slot_q16(long s) { return slot_i16(s) + block_samples; }

    void produce_loop() {
        const float scale = 1.0f / 32768.0f;
        long remaining = is_wav ? wav.data_bytes / 4 : -1;
        while (!stop.load()) {
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_prod.wait(lk, [&] {
                    return stop.load() ||
                           head.load() - tail.load() < ring_blocks;
                });
                if (stop.load()) break;
            }
            long want = block_samples;
            if (remaining >= 0 && remaining < want) want = remaining;
            long got = 0;
            if (want > 0) {
                got = (long)fread(scratch.data(), 4, want, file);
            }
            if (got < block_samples) {
                if (loop && got >= 0) {
                    fseek(file, is_wav ? wav.data_offset : 0, SEEK_SET);
                    remaining = is_wav ? wav.data_bytes / 4 : -1;
                    long more = (long)fread(scratch.data() + 2 * got, 4,
                                            block_samples - got, file);
                    got += more;
                }
            }
            if (remaining >= 0) remaining -= got;

            long s = head.load();
            if (raw) {
                int16_t* ip = slot_i16(s);
                int16_t* qp = slot_q16(s);
                for (long k = 0; k < got; ++k) {
                    ip[k] = scratch[2 * k];
                    qp[k] = scratch[2 * k + 1];
                }
                for (long k = got; k < block_samples; ++k) ip[k] = qp[k] = 0;
            } else {
                float* ip = slot_i(s);
                float* qp = slot_q(s);
                for (long k = 0; k < got; ++k) {
                    ip[k] = scratch[2 * k] * scale;
                    qp[k] = scratch[2 * k + 1] * scale;
                }
                for (long k = got; k < block_samples; ++k) ip[k] = qp[k] = 0.0f;
            }
            valid[s % ring_blocks] = got;
            {
                std::lock_guard<std::mutex> lk(mu);
                head.store(s + 1);
                if (got == 0) eof.store(true);
            }
            cv_cons.notify_one();
            if (got == 0 && !loop) break;
        }
    }
};

}  // namespace

extern "C" {

void* uhsdr_ingest_open2(const char* path, long block_samples,
                         long ring_blocks, int loop, int raw_i16) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    Ingest* in = new Ingest();
    in->file = f;
    in->loop = loop != 0;
    in->raw = raw_i16 != 0;
    in->block_samples = block_samples;
    in->ring_blocks = ring_blocks > 1 ? ring_blocks : 2;

    const char* dot = strrchr(path, '.');
    if (dot && (strcmp(dot, ".wav") == 0 || strcmp(dot, ".WAV") == 0)) {
        if (!parse_wav(f, &in->wav)) {
            fclose(f);
            delete in;
            return nullptr;
        }
        in->is_wav = true;
    }
    if (in->raw)
        in->ring16.resize((size_t)in->ring_blocks * 2 * block_samples);
    else
        in->ring.resize((size_t)in->ring_blocks * 2 * block_samples);
    in->valid.resize(in->ring_blocks);
    in->scratch.resize((size_t)2 * block_samples);
    in->producer = std::thread([in] { in->produce_loop(); });
    return in;
}

void* uhsdr_ingest_open(const char* path, long block_samples,
                        long ring_blocks, int loop) {
    return uhsdr_ingest_open2(path, block_samples, ring_blocks, loop, 0);
}

namespace {
// shared pop: waits for a produced slot, returns it in *slot (or false at
// end of stream)
bool pop_slot(Ingest* in, long* slot, long* n) {
    {
        std::unique_lock<std::mutex> lk(in->mu);
        in->cv_cons.wait(lk, [&] {
            return in->head.load() > in->tail.load() || in->eof.load();
        });
        if (in->head.load() <= in->tail.load()) return false;
    }
    *slot = in->tail.load();
    *n = in->valid[*slot % in->ring_blocks];
    return true;
}
}  // namespace

// returns number of valid samples copied (0 = end of stream)
long uhsdr_ingest_next(void* handle, float* i_out, float* q_out) {
    Ingest* in = (Ingest*)handle;
    if (in->raw) return -1;           // wrong-mode guard
    long s, n;
    if (!pop_slot(in, &s, &n)) return 0;
    memcpy(i_out, in->slot_i(s), in->block_samples * sizeof(float));
    memcpy(q_out, in->slot_q(s), in->block_samples * sizeof(float));
    {
        std::lock_guard<std::mutex> lk(in->mu);
        in->tail.store(s + 1);
    }
    in->cv_prod.notify_one();
    return n;
}

// raw_i16 mode pop: UNCONVERTED int16 planes (half the memcpy traffic);
// the chain converts on-device (pallas/fir in_scale).  -1 = wrong mode.
long uhsdr_ingest_next_i16(void* handle, int16_t* i_out, int16_t* q_out) {
    Ingest* in = (Ingest*)handle;
    if (!in->raw) return -1;          // wrong-mode guard
    long s, n;
    if (!pop_slot(in, &s, &n)) return 0;
    memcpy(i_out, in->slot_i16(s), in->block_samples * sizeof(int16_t));
    memcpy(q_out, in->slot_q16(s), in->block_samples * sizeof(int16_t));
    {
        std::lock_guard<std::mutex> lk(in->mu);
        in->tail.store(s + 1);
    }
    in->cv_prod.notify_one();
    return n;
}

void uhsdr_ingest_close(void* handle) {
    Ingest* in = (Ingest*)handle;
    {
        std::lock_guard<std::mutex> lk(in->mu);
        in->stop.store(true);
    }
    in->cv_prod.notify_all();
    if (in->producer.joinable()) in->producer.join();
    fclose(in->file);
    delete in;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fleet ingest: N capture files -> one batched (channels, block) pair of
// f32 planes per pop.  Each channel runs its own producer thread (the
// multi-receiver analog of per-radio DMA streams); `fleet_next` gathers
// one block from every channel into caller-provided (n*block) buffers.
// ---------------------------------------------------------------------------

namespace {

struct Fleet {
    std::vector<void*> channels;
    long block_samples = 0;
};

}  // namespace

extern "C" {

void* uhsdr_fleet_open(const char** paths, long n_channels,
                       long block_samples, long ring_blocks, int loop) {
    Fleet* fl = new Fleet();
    fl->block_samples = block_samples;
    for (long c = 0; c < n_channels; ++c) {
        void* h = uhsdr_ingest_open(paths[c], block_samples, ring_blocks,
                                    loop);
        if (!h) {
            for (void* hh : fl->channels) uhsdr_ingest_close(hh);
            delete fl;
            return nullptr;
        }
        fl->channels.push_back(h);
    }
    return fl;
}

// i_out/q_out: (n_channels * block_samples) floats, channel-major.
// Returns the MINIMUM valid sample count across channels (0 = any ended).
long uhsdr_fleet_next(void* handle, float* i_out, float* q_out) {
    Fleet* fl = (Fleet*)handle;
    long min_valid = fl->block_samples;
    for (size_t c = 0; c < fl->channels.size(); ++c) {
        long n = uhsdr_ingest_next(fl->channels[c],
                                   i_out + c * fl->block_samples,
                                   q_out + c * fl->block_samples);
        if (n < min_valid) min_valid = n;
    }
    return min_valid;
}

void uhsdr_fleet_close(void* handle) {
    Fleet* fl = (Fleet*)handle;
    for (void* h : fl->channels) uhsdr_ingest_close(h);
    delete fl;
}

}  // extern "C"
