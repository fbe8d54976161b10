using System;

namespace Graft.Sample.Services
{
    public class Service
    {
        public int Run() { return 42; }
    }
}
