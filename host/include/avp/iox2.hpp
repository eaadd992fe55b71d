// iceoryx2-model zero-copy pub/sub services over POSIX shared memory.
//
// Reproduces the reference's IceOryx2 middleware recipe contract
// (reference: VisionPilot/middleware_recipes/IceOryx2/README.md:6-12 —
// service "VisionPilot/RawFrames" carrying RawFrame from frame_node to
// inference_node/viz_node, service "VisionPilot/CIPO" carrying
// CIPOMessage from inference_node to viz_node) with the same
// programming model as the iceoryx2 C++ binding: named services, a
// publisher that LOANS an uninitialized sample in shared memory, fills
// it in place (zero-copy: the frame is decoded directly into the
// mapped segment) and sends it; subscribers that receive samples
// without the writer ever blocking.
//
// The wire mechanism is intentionally not iceoryx2's (no central
// daemon/registry): a per-service SHM segment with per-slot seqlocks,
// the same lock-free single-writer pattern as avp::host::SharedState.
// Sample delivery semantics match an iceoryx2 subscriber with a
// bounded queue: in-order, every sample delivered while the reader
// keeps up, oldest samples dropped (and counted) under backpressure.
// This is a contract-compatible shim, NOT the iceoryx2 library: the
// node sources in host/middleware/iox2/ link this core. Porting them
// to the real binding is mechanical (loan/send/receive map 1:1) but no
// such compile path ships here, because iceoryx2 is not available to
// build or test against in this tree.

#pragma once

#include <cstdint>
#include <cstddef>
#include <optional>
#include <string>
#include <utility>

namespace avp::iox2 {

// Untyped core: one single-writer service segment. Thread-safe for one
// publisher process + any number of subscriber processes.
class ServiceCore {
 public:
    // `create`: publisher side sizes and initializes the segment;
    // subscribers open an existing one (retrying until the publisher
    // has created it is the caller's job — see wait_open()).
    ServiceCore(const std::string& service_name, uint64_t payload_bytes,
                uint32_t n_slots, bool create);
    ~ServiceCore();

    ServiceCore(const ServiceCore&) = delete;
    ServiceCore& operator=(const ServiceCore&) = delete;

    bool ok() const { return base_ != nullptr; }
    uint64_t payload_bytes() const { return payload_bytes_; }

    // --- publisher side -------------------------------------------------
    // Loan the next slot: marks it write-in-progress and returns the
    // payload pointer. Exactly one loan may be outstanding.
    void* loan();
    // Publish the loaned slot (release-fence + latest update). Returns
    // the sample sequence number (1-based).
    uint64_t publish();

    // --- subscriber side ------------------------------------------------
    // Copy the oldest unseen consistent sample into `out`.
    // `last_seen` is subscriber-local state (start at 0); on success it
    // advances to the delivered sample's seq. `lost` (optional) counts
    // samples skipped because the writer lapped the reader.
    bool receive(void* out, uint64_t* last_seen, uint64_t* lost = nullptr);
    // Latest published sample seq (0 = nothing yet).
    uint64_t latest() const;

    // Subscriber helper: open, retrying up to `timeout_ms` for the
    // publisher to create the segment. Returns nullptr on timeout.
    static ServiceCore* wait_open(const std::string& service_name,
                                  uint64_t payload_bytes, uint32_t n_slots,
                                  int timeout_ms);

 private:
    uint8_t* slot_payload(uint32_t i) const;
    uint64_t* slot_wseq(uint32_t i) const;

    int fd_ = -1;
    uint8_t* base_ = nullptr;
    size_t total_ = 0;
    uint64_t payload_bytes_ = 0;
    uint32_t n_slots_ = 0;
    uint64_t loaned_seq_ = 0;   // seq of the outstanding loan (0 = none)
    bool owner_ = false;
    std::string shm_name_;
};

// ---------------------------------------------------------------------------
// Typed layer mirroring the iceoryx2 C++ binding surface used by the
// reference nodes (loan_uninit / payload_mut / send / receive), so the
// node code reads the same against either backend.
// ---------------------------------------------------------------------------

template <typename T>
class SampleMut {
 public:
    explicit SampleMut(ServiceCore* core) : core_(core) {
        payload_ = static_cast<T*>(core_->loan());
    }
    T& payload_mut() { return *payload_; }

 private:
    template <typename U>
    friend uint64_t send(SampleMut<U>&& sample);
    ServiceCore* core_;
    T* payload_;
};

template <typename T>
uint64_t send(SampleMut<T>&& sample) { return sample.core_->publish(); }

template <typename T>
class Publisher {
 public:
    explicit Publisher(ServiceCore* core) : core_(core) {}
    SampleMut<T> loan_uninit() { return SampleMut<T>(core_); }

 private:
    ServiceCore* core_;
};

// A received sample (already a private consistent copy — unlike a raw
// in-segment pointer, it cannot be torn by a writer lapping the ring).
template <typename T>
struct Sample {
    T value;
    uint64_t seq = 0;
    uint64_t lost_before = 0;  // samples dropped since the previous one
    const T& payload() const { return value; }
};

template <typename T>
class Subscriber {
 public:
    explicit Subscriber(ServiceCore* core) : core_(core) {}

    std::optional<Sample<T>> receive() {
        Sample<T> s;
        s.lost_before = 0;
        uint64_t lost = 0;
        if (!core_->receive(&s.value, &last_seen_, &lost))
            return std::nullopt;
        s.seq = last_seen_;
        s.lost_before = lost;
        return s;
    }

 private:
    ServiceCore* core_;
    uint64_t last_seen_ = 0;
};

// Service factory in the iceoryx2 builder style:
//   auto svc = open_or_create<RawFrame>("VisionPilot/RawFrames", 4, true);
//   Publisher<RawFrame> pub(svc);
template <typename T>
ServiceCore* open_or_create(const std::string& name, uint32_t n_slots,
                            bool create, int subscriber_timeout_ms = 5000) {
    if (create)
        return new ServiceCore(name, sizeof(T), n_slots, true);
    return ServiceCore::wait_open(name, sizeof(T), n_slots,
                                  subscriber_timeout_ms);
}

}  // namespace avp::iox2
