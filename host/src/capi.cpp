// C API over the host runtime primitives for Python ctypes bindings.
// The Python pipeline publishes its per-frame state through this; external
// consumers attach with the same ABI as the reference runtime.

#include "avp/shared_state.hpp"

extern "C" {

using avp::host::SharedState;
using avp::host::VisionPilotState;

void* avp_shm_create(const char* name, int owner) {
    auto* s = new SharedState(name, owner != 0);
    if (!s->ok()) {
        delete s;
        return nullptr;
    }
    return s;
}

void avp_shm_destroy(void* handle) {
    delete static_cast<SharedState*>(handle);
}

void avp_shm_publish(void* handle, const VisionPilotState* state) {
    static_cast<SharedState*>(handle)->publish(*state);
}

void avp_shm_read(void* handle, VisionPilotState* out) {
    static_cast<SharedState*>(handle)->read(out);
}

unsigned long long avp_shm_state_size() {
    return sizeof(VisionPilotState);
}

}  // extern "C"
