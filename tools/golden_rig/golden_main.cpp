// Golden oracle runner: drives the unmodified reference Mapper (compiled from
// /root/reference/src against mini-bwa) on raw calibrated signal and prints
// the resulting PAF plus optional intermediate dumps for differential tests.
//
// usage: golden_map <index_prefix> <signal.f32> <read_id> [--events]
//   signal.f32: little-endian float32 calibrated samples
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "mapper.hpp"

int main(int argc, char** argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s <index_prefix> <signal.f32> <read_id> [--events]\n",
                argv[0]);
        return 2;
    }
    std::string prefix = argv[1], sig_path = argv[2], read_id = argv[3];
    bool dump_events = argc > 4 && std::string(argv[4]) == "--events";

    Mapper::PRMS.bwa_prefix = prefix;
    Mapper::PRMS.idx_preset = "default";
    // CLI-effective event detector params (defaults.toml overrides)
    Mapper::PRMS.event_prms.min_mean = 0;
    Mapper::PRMS.event_prms.max_mean = 40000;

    FILE* fp = fopen(sig_path.c_str(), "rb");
    if (!fp) {
        fprintf(stderr, "cannot open %s\n", sig_path.c_str());
        return 2;
    }
    std::vector<float> sig;
    float buf[4096];
    size_t got;
    while ((got = fread(buf, 4, 4096, fp)) > 0) sig.insert(sig.end(), buf, buf + got);
    fclose(fp);

    if (dump_events) {
        EventDetector evdt(Mapper::PRMS.event_prms);
        auto events = evdt.get_events(sig);
        fprintf(stderr, "#total_events %zu mean_evt_len %.8f\n", events.size(),
                evdt.mean_event_len());
        for (auto& e : events)
            printf("E\t%u\t%u\t%.8f\t%.8f\n", e.start, e.length, e.mean, e.stdv);
        return 0;
    }

    Mapper mapper;
    ReadBuffer read;
    read.id_ = read_id;
    read.channel_idx_ = 0;
    read.number_ = 0;
    read.start_sample_ = 0;
    read.full_signal_ = sig;
    read.loc_ = Paf(read_id, 1, 0);
    read.set_raw_len(sig.size());

    ReadBuffer rb_swap = read;
    mapper.new_read(rb_swap);
    Paf paf = mapper.map_read();
    paf.print_paf();
    return 0;
}
