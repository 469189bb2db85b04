// Empirical std::regex ECMAScript behavior probe.
//
// functions/regex_dialect.py pins its emulation against the behavior of
// the stdlib the reference actually links on Linux (GCC libstdc++ —
// reference CMakeLists.txt selects the gcc_64 Qt kit there). libstdc++
// deviates from strict ECMA-262v3 on several corners (\cX is a literal
// X, stacked quantifiers are legal backtracking repeats, invalid brace
// ranges are errors rather than Annex-B literals); every [libstdc++]
// annotation in that module and every pinned case in
// tests/test_regex_dialect.py was measured with this program, not
// derived from the spec.
//
// Build:  g++ -O0 -std=c++17 -o /tmp/ecma_probe tools/ecma_probe.cpp
// Usage:  printf '%s\n' 'a*+' '[\1]' | /tmp/ecma_probe 616161 [icase]
//         argv[1] is the hex-encoded subject (NUL-capable); patterns on
//         stdin, one per line; argv[2] == "icase" adds std::regex::icase
//         (the reference's caseSensitive=false path, FilterData.cpp:
//         172-174). Each line reports ERR <what> for regex_error at
//         construction (the reference then claims no spans —
//         FilterData.cpp:234-237) or OK match@pos:len/nomatch.
//
// Patterns compile exactly as the reference does:
//   std::regex re(line, std::regex::ECMAScript);    FilterData.cpp:171-175
#include <regex>
#include <iostream>
#include <string>

static std::string unhex(const std::string& h) {
    std::string s;
    for (size_t i = 0; i + 1 < h.size(); i += 2)
        s.push_back((char)std::stoi(h.substr(i, 2), nullptr, 16));
    return s;
}

int main(int argc, char** argv) {
    std::string subject = argc > 1 ? unhex(argv[1]) : std::string();
    std::regex::flag_type flags = std::regex::ECMAScript;
    if (argc > 2 && std::string(argv[2]) == "icase") flags |= std::regex::icase;
    std::string line;
    while (std::getline(std::cin, line)) {
        try {
            std::regex re(line, flags);
            std::smatch m;
            bool found = std::regex_search(subject, m, re);
            std::cout << "OK\t"
                      << (found ? "match@" + std::to_string(m.position(0)) +
                                      ":len" + std::to_string(m.length(0))
                                : "nomatch")
                      << "\t" << line << "\n";
        } catch (const std::regex_error& e) {
            std::cout << "ERR\t" << e.what() << "\t" << line << "\n";
        }
    }
    return 0;
}
