#include "avp/shared_state.hpp"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <atomic>
#include <cstring>

namespace avp::host {

SharedState::SharedState(const char* name, bool owner) : owner_(owner) {
    std::strncpy(name_, name, sizeof(name_) - 1);
    name_[sizeof(name_) - 1] = '\0';

    const int flags = owner ? (O_CREAT | O_RDWR) : O_RDONLY;
    fd_ = shm_open(name_, flags, 0666);
    if (fd_ < 0) return;

    if (owner && ftruncate(fd_, sizeof(VisionPilotState)) != 0) {
        close(fd_);
        fd_ = -1;
        return;
    }

    const int prot = owner ? (PROT_READ | PROT_WRITE) : PROT_READ;
    void* p = mmap(nullptr, sizeof(VisionPilotState), prot, MAP_SHARED,
                   fd_, 0);
    if (p == MAP_FAILED) {
        close(fd_);
        fd_ = -1;
        return;
    }
    ptr_ = static_cast<VisionPilotState*>(p);
    if (owner) {
        std::memset(const_cast<VisionPilotState*>(ptr_), 0,
                    sizeof(VisionPilotState));
    }
}

SharedState::~SharedState() {
    if (ptr_ != nullptr) {
        munmap(ptr_, sizeof(VisionPilotState));
    }
    if (fd_ >= 0) {
        close(fd_);
    }
    if (owner_) {
        shm_unlink(name_);
    }
}

void SharedState::publish(const VisionPilotState& state) {
    if (ptr_ == nullptr || !owner_) return;
    const uint64_t start = ptr_->seq;
    ptr_->seq = start + 1;  // odd: write in progress
    std::atomic_thread_fence(std::memory_order_release);

    // copy payload, skipping the seq word itself
    const char* src = reinterpret_cast<const char*>(&state) + sizeof(uint64_t);
    char* dst = reinterpret_cast<char*>(
                    const_cast<VisionPilotState*>(ptr_)) + sizeof(uint64_t);
    std::memcpy(dst, src, sizeof(VisionPilotState) - sizeof(uint64_t));

    std::atomic_thread_fence(std::memory_order_release);
    ptr_->seq = start + 2;  // even: consistent
}

void SharedState::read(VisionPilotState* out) const {
    if (ptr_ == nullptr || out == nullptr) return;
    while (true) {
        const uint64_t s1 = ptr_->seq;
        if (s1 & 1ULL) continue;  // write in progress
        std::atomic_thread_fence(std::memory_order_acquire);
        std::memcpy(out, const_cast<const VisionPilotState*>(ptr_),
                    sizeof(VisionPilotState));
        std::atomic_thread_fence(std::memory_order_acquire);
        const uint64_t s2 = ptr_->seq;
        if (s1 == s2) {
            out->seq = s2;
            return;
        }
    }
}

}  // namespace avp::host
