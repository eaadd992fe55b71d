// Zero-copy shared-memory frame ring (single producer, multi consumer).
//
// The iceoryx2 recipe's role (VisionPilot/RawFrames + VisionPilot/CIPO
// zero-copy services, middleware_recipes/IceOryx2/): a fixed-slot POSIX
// shm ring carrying raw frames between processes with no serialization.
// Each slot has its own seqlock so a reader always gets the latest
// consistent frame without blocking the writer.

#pragma once

#include <cstdint>
#include <cstddef>

namespace avp::host {

struct FrameHeader {
    // Accessed only through std::atomic_ref (frame_ring.cpp) so the POD
    // shared-memory ABI is preserved while loads/stores get formal
    // acquire/release semantics. odd = write in progress.
    uint64_t seq;
    uint64_t frame_number;
    uint32_t height;
    uint32_t width;
    uint32_t channels;
    uint64_t timestamp_ns;
};

struct RingHeader {
    uint32_t n_slots;
    uint32_t slot_bytes;     // payload capacity per slot
    uint64_t latest;  // last published frame_number (atomic_ref access)
};

class FrameRing {
 public:
    // owner=true creates+sizes the segment; capacity = max frame bytes.
    FrameRing(const char* name, bool owner, uint32_t n_slots = 4,
              uint32_t slot_bytes = 1280 * 720 * 3);
    ~FrameRing();

    bool ok() const { return base_ != nullptr; }

    // Producer: copy a frame into the next slot, publish it.
    bool publish(const uint8_t* data, uint32_t height, uint32_t width,
                 uint32_t channels, uint64_t frame_number,
                 uint64_t timestamp_ns);

    // Consumer: copy out the latest consistent frame (returns false when
    // no frame newer than `last_seen` is available).
    bool read_latest(uint8_t* out, uint32_t out_capacity,
                     FrameHeader* header, uint64_t last_seen);

 private:
    uint8_t* slot_ptr(uint32_t i) const;
    FrameHeader* slot_header(uint32_t i) const;

    int fd_ = -1;
    uint8_t* base_ = nullptr;
    size_t total_ = 0;
    bool owner_ = false;
    char name_[64];
};

}  // namespace avp::host
