#include "avp/frame_ring.hpp"

#include <fcntl.h>
#include <sys/mman.h>
#include <unistd.h>

#include <atomic>
#include <cstring>

namespace avp::host {

static size_t ring_size(uint32_t n_slots, uint32_t slot_bytes) {
    return sizeof(RingHeader) +
           static_cast<size_t>(n_slots) *
               (sizeof(FrameHeader) + slot_bytes);
}

FrameRing::FrameRing(const char* name, bool owner, uint32_t n_slots,
                     uint32_t slot_bytes)
    : owner_(owner) {
    std::strncpy(name_, name, sizeof(name_) - 1);
    name_[sizeof(name_) - 1] = '\0';

    const int flags = owner ? (O_CREAT | O_RDWR) : O_RDWR;
    fd_ = shm_open(name_, flags, 0666);
    if (fd_ < 0) return;

    size_t total = ring_size(n_slots, slot_bytes);
    if (owner) {
        if (ftruncate(fd_, static_cast<off_t>(total)) != 0) {
            close(fd_);
            fd_ = -1;
            return;
        }
    } else {
        // consumers read the geometry from the header after mapping just it
        void* hdr = mmap(nullptr, sizeof(RingHeader), PROT_READ, MAP_SHARED,
                         fd_, 0);
        if (hdr == MAP_FAILED) {
            close(fd_);
            fd_ = -1;
            return;
        }
        const RingHeader* rh = static_cast<const RingHeader*>(hdr);
        n_slots = rh->n_slots;
        slot_bytes = rh->slot_bytes;
        munmap(hdr, sizeof(RingHeader));
        total = ring_size(n_slots, slot_bytes);
    }

    void* p = mmap(nullptr, total, PROT_READ | PROT_WRITE, MAP_SHARED,
                   fd_, 0);
    if (p == MAP_FAILED) {
        close(fd_);
        fd_ = -1;
        return;
    }
    base_ = static_cast<uint8_t*>(p);
    total_ = total;

    if (owner) {
        std::memset(base_, 0, total);
        auto* rh = reinterpret_cast<RingHeader*>(base_);
        rh->n_slots = n_slots;
        rh->slot_bytes = slot_bytes;
        rh->latest = 0;
    }
}

FrameRing::~FrameRing() {
    if (base_ != nullptr) munmap(base_, total_);
    if (fd_ >= 0) close(fd_);
    if (owner_) shm_unlink(name_);
}

FrameHeader* FrameRing::slot_header(uint32_t i) const {
    auto* rh = reinterpret_cast<RingHeader*>(base_);
    uint8_t* p = base_ + sizeof(RingHeader) +
                 static_cast<size_t>(i) *
                     (sizeof(FrameHeader) + rh->slot_bytes);
    return reinterpret_cast<FrameHeader*>(p);
}

uint8_t* FrameRing::slot_ptr(uint32_t i) const {
    return reinterpret_cast<uint8_t*>(slot_header(i)) + sizeof(FrameHeader);
}

bool FrameRing::publish(const uint8_t* data, uint32_t height,
                        uint32_t width, uint32_t channels,
                        uint64_t frame_number, uint64_t timestamp_ns) {
    if (base_ == nullptr || !owner_) return false;
    auto* rh = reinterpret_cast<RingHeader*>(base_);
    const size_t bytes =
        static_cast<size_t>(height) * width * channels;
    if (bytes > rh->slot_bytes) return false;

    const uint32_t slot = frame_number % rh->n_slots;
    FrameHeader* h = slot_header(slot);
    // Fence-based seqlock writer (Boehm, "Can seqlocks get along with
    // programming language memory models?"): odd store, release fence,
    // payload, release store of the even seq. `latest` is published with
    // release ordering only AFTER the slot is consistent, so a reader
    // that acquires `latest` always finds an initialized header.
    std::atomic_ref<uint64_t> seq(h->seq);
    const uint64_t s0 = seq.load(std::memory_order_relaxed);
    seq.store(s0 + 1, std::memory_order_relaxed);  // odd
    std::atomic_thread_fence(std::memory_order_release);
    std::memcpy(slot_ptr(slot), data, bytes);
    h->frame_number = frame_number;
    h->height = height;
    h->width = width;
    h->channels = channels;
    h->timestamp_ns = timestamp_ns;
    seq.store(s0 + 2, std::memory_order_release);  // even
    std::atomic_ref<uint64_t>(rh->latest)
        .store(frame_number, std::memory_order_release);
    return true;
}

bool FrameRing::read_latest(uint8_t* out, uint32_t out_capacity,
                            FrameHeader* header, uint64_t last_seen) {
    if (base_ == nullptr) return false;
    auto* rh = reinterpret_cast<RingHeader*>(base_);
    // A consumer can attach before the owner finishes initializing the
    // header — n_slots==0 would make the modulo below divide by zero.
    if (rh->n_slots == 0) return false;
    const uint64_t latest = std::atomic_ref<uint64_t>(rh->latest)
                                .load(std::memory_order_acquire);
    if (latest == 0 || latest <= last_seen) return false;
    const uint32_t slot = latest % rh->n_slots;
    FrameHeader* h = slot_header(slot);
    std::atomic_ref<uint64_t> seq(h->seq);

    for (int attempt = 0; attempt < 64; ++attempt) {
        const uint64_t s1 = seq.load(std::memory_order_acquire);
        if (s1 & 1ULL) continue;
        FrameHeader snap;
        snap.frame_number = h->frame_number;
        snap.height = h->height;
        snap.width = h->width;
        snap.channels = h->channels;
        snap.timestamp_ns = h->timestamp_ns;
        const size_t bytes =
            static_cast<size_t>(snap.height) * snap.width * snap.channels;
        if (bytes > out_capacity) return false;
        std::memcpy(out, slot_ptr(slot), bytes);
        std::atomic_thread_fence(std::memory_order_acquire);
        if (seq.load(std::memory_order_relaxed) == s1) {
            *header = snap;
            header->seq = s1;
            return true;
        }
    }
    return false;
}

}  // namespace avp::host

// ---- C API for ctypes ----
extern "C" {

void* avp_ring_create(const char* name, int owner, unsigned n_slots,
                      unsigned slot_bytes) {
    auto* r = new avp::host::FrameRing(name, owner != 0, n_slots,
                                       slot_bytes);
    if (!r->ok()) {
        delete r;
        return nullptr;
    }
    return r;
}

void avp_ring_destroy(void* h) {
    delete static_cast<avp::host::FrameRing*>(h);
}

int avp_ring_publish(void* h, const unsigned char* data, unsigned height,
                     unsigned width, unsigned channels,
                     unsigned long long frame_number,
                     unsigned long long ts_ns) {
    return static_cast<avp::host::FrameRing*>(h)->publish(
               data, height, width, channels, frame_number, ts_ns)
               ? 1 : 0;
}

int avp_ring_read_latest(void* h, unsigned char* out, unsigned capacity,
                         avp::host::FrameHeader* header,
                         unsigned long long last_seen) {
    return static_cast<avp::host::FrameRing*>(h)->read_latest(
               out, capacity, header, last_seen)
               ? 1 : 0;
}

}  // extern "C"
