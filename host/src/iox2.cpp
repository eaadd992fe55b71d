// iceoryx2-model service core: per-service SHM segment, per-slot
// seqlock, single writer, any number of readers. See avp/iox2.hpp for
// the contract and the mapping to the reference's IceOryx2 recipe.

#include "avp/iox2.hpp"

#include <fcntl.h>
#include <sys/mman.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <cstring>
#include <thread>

namespace avp::iox2 {

namespace {

constexpr uint32_t kMagic = 0x49585332;  // "IXS2"

struct SegHeader {
    uint32_t magic;
    uint32_t n_slots;
    uint64_t payload_bytes;
    uint64_t latest;  // accessed via std::atomic_ref
};

// Slot payloads hold device-frame-sized PODs; keep them cacheline aligned.
constexpr size_t kAlign = 64;

size_t aligned(size_t n) { return (n + kAlign - 1) & ~(kAlign - 1); }

size_t slot_stride(uint64_t payload_bytes) {
    return aligned(sizeof(uint64_t)) + aligned(payload_bytes);
}

size_t seg_size(uint32_t n_slots, uint64_t payload_bytes) {
    return aligned(sizeof(SegHeader)) + n_slots * slot_stride(payload_bytes);
}

// "VisionPilot/RawFrames" -> "/iox2.VisionPilot.RawFrames" (shm_open
// names must be a single path component).
std::string shm_name_for(const std::string& service) {
    std::string n = "/iox2." + service;
    for (size_t i = 1; i < n.size(); ++i)
        if (n[i] == '/') n[i] = '.';
    return n;
}

}  // namespace

ServiceCore::ServiceCore(const std::string& service_name,
                         uint64_t payload_bytes, uint32_t n_slots,
                         bool create)
    : payload_bytes_(payload_bytes), n_slots_(n_slots), owner_(create),
      shm_name_(shm_name_for(service_name)) {
    // Single-writer contract: creating a service that already exists would
    // ftruncate+memset a live segment under subscribers mid-copy. O_EXCL
    // makes a second publisher (or a restart racing a stale segment) fail
    // loudly instead of silently wiping it.
    const int flags = create ? (O_CREAT | O_EXCL | O_RDWR) : O_RDWR;
    fd_ = shm_open(shm_name_.c_str(), flags, 0666);
    if (fd_ < 0) {
        // a second publisher hitting EEXIST must NOT be treated as
        // owner: its destructor would shm_unlink the FIRST publisher's
        // live segment
        owner_ = false;
        return;
    }

    size_t total = seg_size(n_slots, payload_bytes);
    if (create) {
        if (ftruncate(fd_, static_cast<off_t>(total)) != 0) {
            close(fd_);
            fd_ = -1;
            return;
        }
    } else {
        // geometry comes from the publisher's header
        void* hdr = mmap(nullptr, sizeof(SegHeader), PROT_READ, MAP_SHARED,
                         fd_, 0);
        if (hdr == MAP_FAILED) {
            close(fd_);
            fd_ = -1;
            return;
        }
        const auto* sh = static_cast<const SegHeader*>(hdr);
        bool valid = sh->magic == kMagic &&
                     sh->payload_bytes == payload_bytes;
        n_slots_ = sh->n_slots;
        munmap(hdr, sizeof(SegHeader));
        if (!valid) {  // type mismatch = different service ABI: refuse
            close(fd_);
            fd_ = -1;
            return;
        }
        total = seg_size(n_slots_, payload_bytes);
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

    if (create) {
        std::memset(base_, 0, total);
        auto* sh = reinterpret_cast<SegHeader*>(base_);
        sh->n_slots = n_slots_;
        sh->payload_bytes = payload_bytes_;
        sh->latest = 0;
        std::atomic_thread_fence(std::memory_order_release);
        // magic last: subscribers only trust a fully initialized header
        std::atomic_ref<uint32_t>(sh->magic).store(
            kMagic, std::memory_order_release);
    }
}

ServiceCore::~ServiceCore() {
    if (base_ != nullptr) munmap(base_, total_);
    if (fd_ >= 0) close(fd_);
    if (owner_) shm_unlink(shm_name_.c_str());
}

uint64_t* ServiceCore::slot_wseq(uint32_t i) const {
    return reinterpret_cast<uint64_t*>(
        base_ + aligned(sizeof(SegHeader)) + i * slot_stride(payload_bytes_));
}

uint8_t* ServiceCore::slot_payload(uint32_t i) const {
    return reinterpret_cast<uint8_t*>(slot_wseq(i)) +
           aligned(sizeof(uint64_t));
}

void* ServiceCore::loan() {
    auto* sh = reinterpret_cast<SegHeader*>(base_);
    const uint64_t s = sh->latest + 1;  // single writer: plain read is ours
    loaned_seq_ = s;
    const uint32_t slot = static_cast<uint32_t>((s - 1) % n_slots_);
    // odd = write in progress (seqlock). Readers of the sample this slot
    // previously held see wseq advance and treat it as lapped.
    std::atomic_ref<uint64_t>(*slot_wseq(slot))
        .store(2 * s + 1, std::memory_order_release);
    // A release *store* does not order the caller's LATER plain payload
    // writes after the odd marker; on weakly-ordered CPUs (aarch64) they
    // could become visible first and a reader's post-memcpy recheck would
    // still see the old even wseq -> torn sample accepted. Mirror the
    // kernel's write_seqcount_begin(); smp_wmb(); data-writes pattern.
    std::atomic_thread_fence(std::memory_order_release);
    return slot_payload(slot);
}

uint64_t ServiceCore::publish() {
    const uint64_t s = loaned_seq_;
    const uint32_t slot = static_cast<uint32_t>((s - 1) % n_slots_);
    std::atomic_ref<uint64_t>(*slot_wseq(slot))
        .store(2 * s + 2, std::memory_order_release);
    auto* sh = reinterpret_cast<SegHeader*>(base_);
    std::atomic_ref<uint64_t>(sh->latest).store(s, std::memory_order_release);
    loaned_seq_ = 0;
    return s;
}

uint64_t ServiceCore::latest() const {
    auto* sh = reinterpret_cast<SegHeader*>(base_);
    return std::atomic_ref<uint64_t>(sh->latest)
        .load(std::memory_order_acquire);
}

bool ServiceCore::receive(void* out, uint64_t* last_seen, uint64_t* lost) {
    const uint64_t lt = latest();
    if (lt <= *last_seen) return false;

    // Oldest unseen sample that can still be intact in the ring: the
    // writer may already be loaning lt+1 (overwriting slot of lt+1-n),
    // so only lt-n+2 .. lt are guaranteed un-lapped. Start one earlier
    // and let seqlock validation sort it out.
    uint64_t s = *last_seen + 1;
    if (lt >= n_slots_ && s < lt - n_slots_ + 1) s = lt - n_slots_ + 1;

    for (; s <= lt; ++s) {
        const uint32_t slot = static_cast<uint32_t>((s - 1) % n_slots_);
        std::atomic_ref<uint64_t> w(*slot_wseq(slot));
        if (w.load(std::memory_order_acquire) != 2 * s + 2)
            continue;  // lapped or mid-write: sample lost, move on
        std::memcpy(out, slot_payload(slot), payload_bytes_);
        std::atomic_thread_fence(std::memory_order_acquire);
        if (w.load(std::memory_order_acquire) != 2 * s + 2)
            continue;  // torn by the writer during the copy
        if (lost != nullptr) *lost = s - (*last_seen + 1);
        *last_seen = s;
        return true;
    }
    // everything unseen was lapped before we could copy it
    if (lost != nullptr) *lost = lt - *last_seen;
    *last_seen = lt;
    return false;
}

ServiceCore* ServiceCore::wait_open(const std::string& service_name,
                                    uint64_t payload_bytes, uint32_t n_slots,
                                    int timeout_ms) {
    const auto deadline = std::chrono::steady_clock::now() +
                          std::chrono::milliseconds(timeout_ms);
    for (;;) {
        auto* c = new ServiceCore(service_name, payload_bytes, n_slots,
                                  false);
        if (c->ok()) return c;
        delete c;
        if (std::chrono::steady_clock::now() >= deadline) return nullptr;
        std::this_thread::sleep_for(std::chrono::milliseconds(10));
    }
}

}  // namespace avp::iox2

// ---------------------------------------------------------------------------
// C API for Python ctypes (middleware/iox2_transport.py)
// ---------------------------------------------------------------------------
extern "C" {

void* avp_iox2_open(const char* service, unsigned long long payload_bytes,
                    unsigned n_slots, int create, int timeout_ms) {
    using avp::iox2::ServiceCore;
    if (create != 0) {
        auto* c = new ServiceCore(service, payload_bytes, n_slots, true);
        if (!c->ok()) {
            delete c;
            return nullptr;
        }
        return c;
    }
    return ServiceCore::wait_open(service, payload_bytes, n_slots,
                                  timeout_ms);
}

void avp_iox2_close(void* h) {
    delete static_cast<avp::iox2::ServiceCore*>(h);
}

void* avp_iox2_loan(void* h) {
    return static_cast<avp::iox2::ServiceCore*>(h)->loan();
}

unsigned long long avp_iox2_publish(void* h) {
    return static_cast<avp::iox2::ServiceCore*>(h)->publish();
}

// returns 1 and updates *last_seen/*lost on delivery, 0 otherwise
int avp_iox2_receive(void* h, void* out, unsigned long long* last_seen,
                     unsigned long long* lost) {
    uint64_t seen = *last_seen, lst = 0;
    bool got = static_cast<avp::iox2::ServiceCore*>(h)->receive(out, &seen,
                                                                &lst);
    *last_seen = seen;
    *lost = lst;
    return got ? 1 : 0;
}

unsigned long long avp_iox2_latest(void* h) {
    return static_cast<avp::iox2::ServiceCore*>(h)->latest();
}

}  // extern "C"
